"""pyrMeanShiftFiltering: posterizes noisy regions, preserves edges,
device twin distributionally matches the oracle."""

import numpy as np

from rustcv_tpu.ops import meanshift_filter as msf


def _scene(seed=0, noise=8):
    rng = np.random.default_rng(seed)
    img = np.zeros((48, 64, 3), np.float64)
    img[:, :32] = (60, 80, 100)
    img[:, 32:] = (180, 160, 140)
    img += rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestOracle:
    def test_posterizes_and_keeps_regions(self):
        img = _scene()
        out = msf.pyr_mean_shift_numpy(img, sp=6, sr=30.0, max_level=1,
                                       max_iter=4)
        for sel, target in ((np.s_[:, :30], (60, 80, 100)),
                            (np.s_[:, 34:], (180, 160, 140))):
            region = out[sel]
            assert region.std(axis=(0, 1)).max() < 2.0    # flattened
            assert np.abs(region.mean(axis=(0, 1))
                          - np.asarray(target)).max() < 3.0
        # noise was ~8 std going in
        assert img[:, :30].std(axis=(0, 1)).min() > 6.0

    def test_edge_not_smeared(self):
        img = _scene()
        out = msf.pyr_mean_shift_numpy(img, sp=6, sr=30.0, max_level=0,
                                       max_iter=4)
        # columns adjacent to the boundary keep their side's level
        left_edge = out[:, 30, 0].mean()
        right_edge = out[:, 34, 0].mean()
        assert right_edge - left_edge > 100

    def test_flat_image_unchanged(self):
        img = np.full((32, 40, 3), 77, np.uint8)
        out = msf.pyr_mean_shift_numpy(img, sp=4, sr=20.0, max_level=0,
                                       max_iter=3)
        np.testing.assert_array_equal(out, img)


class TestDeviceTwin:
    def test_distributional_match(self, jax_cpu):
        # small static params: the device program unrolls (2sp+1)^2 x
        # max_iter x levels gathers -- keep the CPU-mesh compile cheap
        img = _scene()[:32, :40]
        g = msf.pyr_mean_shift_numpy(img, sp=3, sr=30.0, max_level=0,
                                     max_iter=2)
        d = np.asarray(msf.pyr_mean_shift(img, sp=3, sr=30.0,
                                          max_level=0, max_iter=2))
        diff = np.abs(d.astype(int) - g.astype(int))
        assert (diff <= 1).mean() > 0.99
        assert np.median(diff) == 0

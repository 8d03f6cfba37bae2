"""Zhang-Suen thinning + Perona-Malik diffusion: device bit-exact /
±1 LSB vs the frozen oracles, skeleton properties, facade round-trip."""

import numpy as np
import pytest

from rustcv_tpu.ops import morphx


def _shapes(seed=0):
    m = np.zeros((60, 90), np.uint8)
    m[20:40, 10:80] = 1
    m[10:50, 40:48] = 1
    rng = np.random.default_rng(seed)
    # a blobby disc
    yy, xx = np.mgrid[0:60, 0:90]
    m |= ((yy - 45) ** 2 + (xx - 70) ** 2 < 64).astype(np.uint8)
    return m


class TestThinning:
    def test_device_bit_exact(self, jax_cpu):
        m = _shapes()
        ref = morphx.thinning_numpy(m)
        dev = np.asarray(morphx.thinning(m))
        np.testing.assert_array_equal(ref, dev)

    def test_skeleton_is_thin(self):
        sk = morphx.thinning_numpy(_shapes())
        # no interior pixel survives: every 3×3 all-ones block is gone
        p = np.pad(sk, 1)
        full = np.ones((3, 3), np.uint8)
        for y in range(sk.shape[0]):
            for x in range(sk.shape[1]):
                if sk[y, x]:
                    assert not (p[y:y + 3, x:x + 3] == full).all()

    def test_skeleton_subset_and_nonempty(self):
        m = _shapes()
        sk = morphx.thinning_numpy(m)
        assert (sk <= m).all()
        assert 0 < sk.sum() < m.sum()

    def test_idempotent(self):
        sk = morphx.thinning_numpy(_shapes())
        np.testing.assert_array_equal(sk, morphx.thinning_numpy(sk))

    def test_single_pixel_line_preserved(self):
        m = np.zeros((20, 40), np.uint8)
        m[10, 5:35] = 1
        sk = morphx.thinning_numpy(m)
        assert sk.sum() >= 28  # a 1-px line is already a skeleton


class TestDiffusion:
    def test_device_within_one_lsb(self, jax_cpu):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (40, 50)).astype(np.uint8)
        ref = morphx.anisotropic_diffusion_numpy(img)
        dev = np.asarray(morphx.anisotropic_diffusion(img))
        assert np.abs(ref.astype(int) - dev.astype(int)).max() <= 1

    def test_color_channels_independent(self, jax_cpu):
        rng = np.random.default_rng(2)
        bgr = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
        ref = morphx.anisotropic_diffusion_numpy(bgr)
        per = np.stack([morphx.anisotropic_diffusion_numpy(bgr[..., c])
                        for c in range(3)], axis=-1)
        np.testing.assert_array_equal(ref, per)

    def test_edge_preserving(self):
        # a strong step survives; weak noise smooths out
        img = np.full((40, 60), 40.0)
        img[:, 30:] = 200.0
        rng = np.random.default_rng(3)
        noisy = img + rng.normal(0, 3, img.shape)
        out = morphx.anisotropic_diffusion_numpy(noisy, 0.2, 10.0, 20)
        # noise variance drops on the flats
        assert out[:, :25].std() < noisy[:, :25].std() * 0.5
        # the step stays sharp: 1-column transition magnitude preserved
        step = np.abs(np.diff(out.mean(axis=0)))
        assert step.max() > 120

    def test_flat_image_fixed_point(self):
        img = np.full((16, 16), 77, np.uint8)
        out = morphx.anisotropic_diffusion_numpy(img)
        np.testing.assert_array_equal(out, img)


class TestFacade:
    def test_thinning_mat(self, jax_cpu):
        from rustcv_tpu import imgproc as ip
        from rustcv_tpu.core import Mat

        m = (_shapes() * 255).astype(np.uint8)
        out = ip.thinning(Mat.from_array(m)).to_numpy()
        assert set(np.unique(out)) <= {0, 255}
        ref = morphx.thinning_numpy(m) * 255
        np.testing.assert_array_equal(out.squeeze(), ref)

    def test_diffusion_mat(self, jax_cpu):
        from rustcv_tpu import imgproc as ip
        from rustcv_tpu.core import Mat

        rng = np.random.default_rng(5)
        bgr = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
        out = ip.anisotropic_diffusion(Mat.from_array(bgr)).to_numpy()
        ref = morphx.anisotropic_diffusion_numpy(bgr)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

"""Watershed — basin recovery on synthetic landscapes + exact oracle
parity (both implement the same minimax-bottleneck spec)."""

import numpy as np
import pytest

from rustcv_tpu.ops import watershed as ws


def _two_basins(h=60, w=80, ridge_x=40):
    """Intensity low in two basins, high wall between them."""
    img = np.full((h, w), 40, np.uint8)
    img[:, ridge_x - 2 : ridge_x + 3] = 200  # the ridge
    return img


class TestWatershed:
    def test_two_basins_split_at_ridge(self, jax_cpu):
        img = _two_basins()
        markers = np.zeros(img.shape, np.int32)
        markers[30, 10] = 1
        markers[30, 70] = 2
        out = ws.watershed(img, markers)
        assert (out[:, :35] == 1).all()
        assert (out[:, 46:] == 2).all()
        # a single-pixel-wide vertical ridge line exists
        assert ((out == -1).sum(axis=1) >= 1).all()

    def test_device_matches_oracle(self, jax_cpu):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 50), np.uint8)
        markers = np.zeros(img.shape, np.int32)
        for i, (y, x) in enumerate([(5, 5), (35, 45), (20, 25), (10, 40)]):
            markers[y, x] = i + 1
        dev = ws.watershed(img, markers)
        ora = ws.watershed_numpy(img, markers)
        assert np.array_equal(dev, ora)

    def test_seeds_keep_labels(self, jax_cpu):
        img = np.full((20, 20), 50, np.uint8)  # flat: min-label wins the tie
        markers = np.zeros(img.shape, np.int32)
        markers[5, 5] = 3
        markers[15, 15] = 7
        out = ws.watershed(img, markers)
        assert out[5, 5] == 3 and out[15, 15] == 7

    def test_no_seeds_all_zero(self, jax_cpu):
        img = _two_basins()
        out = ws.watershed(img, np.zeros(img.shape, np.int32))
        assert (out == 0).all()

    def test_moat_still_floods(self, jax_cpu):
        """A 255 wall does NOT stop the flood (bottleneck just rises) —
        every pixel gets a label when any seed exists."""
        img = np.full((30, 30), 10, np.uint8)
        img[10:20, 10:20] = 0
        img[9:21, 9:21][np.pad(np.zeros((10, 10), bool), 1,
                               constant_values=True)] = 255
        markers = np.zeros(img.shape, np.int32)
        markers[0, 0] = 1
        out = ws.watershed(img, markers)
        assert (out != 0).all()
        assert out[15, 15] == 1

    def test_randomized_parity_sweep(self, jax_cpu):
        """Plateaus and ties everywhere (quantized intensities) — the
        schedule-independence argument must hold exactly."""
        for trial in range(12):
            rng = np.random.default_rng(trial)
            img = rng.integers(0, 6, (10, 12), np.uint8) * 50
            markers = np.zeros(img.shape, np.int32)
            for i in range(int(rng.integers(1, 5))):
                markers[rng.integers(0, 10), rng.integers(0, 12)] = i + 1
            assert np.array_equal(ws.watershed(img, markers),
                                  ws.watershed_numpy(img, markers)), trial

    def test_bad_markers_raise(self, jax_cpu):
        img = np.zeros((8, 8), np.uint8)
        with pytest.raises(ValueError, match="marker labels"):
            ws.watershed(img, np.full((8, 8), -2, np.int32))
        with pytest.raises(ValueError, match="marker labels"):
            ws.watershed(img, np.full((8, 8), 2**30, np.int64))

    def test_facade_with_components_pipeline(self, jax_cpu):
        """Typical usage: distance-transform peaks as seeds."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _two_basins(40, 60, 30)
        markers = np.zeros(img.shape, np.int32)
        markers[20, 8] = 1
        markers[20, 52] = 2
        out = imgproc.watershed(Mat.from_array(img), markers)
        assert set(np.unique(out)) <= {-1, 1, 2}
        assert (out[:, :25] == 1).all() and (out[:, 36:] == 2).all()

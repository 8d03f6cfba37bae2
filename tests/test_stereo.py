"""StereoBM: disparity recovery on synthetic rectified pairs, device vs
oracle, validity semantics, sub-pixel accuracy."""

import numpy as np
import pytest

from rustcv_tpu.ops import golden, stereo


@pytest.fixture()
def textured(rng):
    return golden.gaussian5_u8(
        rng.integers(0, 256, (120, 300), np.uint8)
    )


class TestStereoBM:
    def test_constant_disparity(self, jax_cpu, textured, rng):
        d_true = 17
        left = textured[:, 0:180]
        right = textured[:, d_true : 180 + d_true]
        disp, valid = stereo.stereo_bm(left, right, num_disparities=32, block_size=11)
        disp, valid = np.asarray(disp), np.asarray(valid)
        assert valid.mean() > 0.6
        err = np.abs(disp[valid] - d_true)
        assert np.median(disp[valid]) == pytest.approx(d_true, abs=0.1)
        assert (err < 0.5).mean() > 0.99

    def test_device_matches_oracle(self, jax_cpu, textured):
        left = textured[:, 0:160]
        right = textured[:, 9:169]
        d, v = stereo.stereo_bm(left, right, num_disparities=16, block_size=9)
        od, ov = stereo.stereo_bm_numpy(left, right, num_disparities=16, block_size=9)
        np.testing.assert_array_equal(np.asarray(v), ov)
        assert np.abs(np.asarray(d) - od).max() < 1e-4

    def test_two_depth_bands(self, jax_cpu, textured):
        l3 = textured[:, 0:220].copy()
        r3 = np.zeros_like(l3)
        r3[:, :110] = textured[:, 8:228][:, :110]
        r3[:, 110:] = textured[:, 20:240][:, 110:]
        disp, v = stereo.stereo_bm(l3, r3, num_disparities=32, block_size=11)
        disp, v = np.asarray(disp), np.asarray(v)
        lb = disp[:, 40:100][v[:, 40:100]]
        rb = disp[:, 130:210][v[:, 130:210]]
        assert np.median(lb) == pytest.approx(8, abs=0.2)
        assert np.median(rb) == pytest.approx(20, abs=0.2)

    def test_flat_regions_rejected(self, jax_cpu):
        flat = np.full((60, 120), 128, np.uint8)
        _, valid = stereo.stereo_bm(flat, flat, num_disparities=16, block_size=9)
        assert not np.asarray(valid).any()  # texture test kills everything

    def test_facade(self, jax_cpu, textured):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        left = Mat.from_array(textured[:, 0:160])
        right = Mat.from_array(textured[:, 9:169])
        disp, valid = imgproc.stereo_bm(left, right, num_disparities=16, block_size=9)
        assert np.median(disp[valid]) == pytest.approx(9, abs=0.2)

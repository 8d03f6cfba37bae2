"""StereoSGBM: recovers known disparity, device twin matches the int64
oracle exactly on the integer pipeline, option plumbing works."""

import numpy as np
import pytest

from rustcv_tpu.ops import sgbm


def _pair(h=40, w=96, d=5, seed=7):
    """Rectified pair with a constant true disparity ``d``:
    L(x) = base(x), R(x) = base(x + d)  ⇒  L(x) == R(x − d)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w + d)).astype(np.uint8)
    return base[:, :w], base[:, d:d + w]


class TestGolden:
    def test_recovers_constant_disparity(self):
        d_true = 5
        left, right = _pair(d=d_true)
        disp, valid = sgbm.stereo_sgbm_numpy(left, right, num_disparities=16)
        inner = np.zeros_like(valid)
        inner[4:-4, 20:-4] = True  # clear of borders and the left band
        sel = valid & inner
        assert sel.mean() > 0.5
        assert np.abs(disp[sel] - d_true).max() <= 0.5

    def test_two_plane_scene(self):
        h, w = 40, 120
        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, (h, w + 16)).astype(np.uint8)
        left = base[:, :w]
        right = np.empty_like(left)
        right[:, : w // 2] = base[:, 4 : 4 + w // 2]          # d = 4
        right[:, w // 2 :] = base[:, 9 + w // 2 : 9 + w]      # d = 9
        disp, valid = sgbm.stereo_sgbm_numpy(left, right, num_disparities=16)
        lsel = valid[4:-4, 20 : w // 2 - 8]
        rsel = valid[4:-4, w // 2 + 12 : -4]
        assert lsel.mean() > 0.5 and rsel.mean() > 0.5
        assert np.abs(disp[4:-4, 20 : w // 2 - 8][lsel] - 4).max() <= 0.5
        assert np.abs(disp[4:-4, w // 2 + 12 : -4][rsel] - 9).max() <= 0.5

    def test_flat_pair_collapses_to_zero(self):
        # All-zero costs: every d ties, the spec's tie rule picks d=0 and
        # uniqueness (0 >= 0) cannot reject — same as OpenCV SGBM, which
        # has no texture gate (that's StereoBM's check).
        left = np.full((32, 80), 90, np.uint8)
        disp, valid = sgbm.stereo_sgbm_numpy(left, left, num_disparities=16)
        assert (disp == 0).all()


class TestDeviceTwin:
    @pytest.mark.parametrize("num_dirs", [4, 8])
    def test_matches_oracle(self, jax_cpu, num_dirs):
        left, right = _pair()
        gdisp, gvalid = sgbm.stereo_sgbm_numpy(
            left, right, num_disparities=16, num_dirs=num_dirs)
        ddisp, dvalid = sgbm.stereo_sgbm(
            left, right, num_disparities=16, num_dirs=num_dirs)
        ddisp, dvalid = np.asarray(ddisp), np.asarray(dvalid)
        np.testing.assert_array_equal(dvalid, gvalid)
        # integer winner exact; f32 parabola vs f64 within 1e-3
        np.testing.assert_array_equal(np.floor(ddisp + 0.5),
                                      np.floor(gdisp + 0.5))
        np.testing.assert_allclose(ddisp, gdisp, atol=1e-3)

    def test_lr_check_disable(self, jax_cpu):
        left, right = _pair()
        g = sgbm.stereo_sgbm_numpy(left, right, num_disparities=16,
                                   disp12_max_diff=-1)
        d = sgbm.stereo_sgbm(left, right, num_disparities=16,
                             disp12_max_diff=-1)
        np.testing.assert_array_equal(np.asarray(d[1]), g[1])
        np.testing.assert_allclose(np.asarray(d[0]), g[0], atol=1e-3)

    def test_occlusion_invalidated_by_lr(self):
        """A disparity jump creates occluded columns; the LR check must
        invalidate more pixels than the unchecked run."""
        h, w = 40, 120
        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, (h, w + 16)).astype(np.uint8)
        left = base[:, :w]
        right = np.empty_like(left)
        right[:, : w // 2] = base[:, 4 : 4 + w // 2]
        right[:, w // 2 :] = base[:, 9 + w // 2 : 9 + w]
        _, v_lr = sgbm.stereo_sgbm_numpy(left, right, num_disparities=16)
        _, v_no = sgbm.stereo_sgbm_numpy(left, right, num_disparities=16,
                                         disp12_max_diff=-1)
        assert v_lr.sum() < v_no.sum()

"""Farneback dense optical flow — frozen-spec oracle parity + accuracy
on known motion fields (the reference has no dense flow; this covers the
OpenCV calcOpticalFlowFarneback role)."""

import numpy as np
import pytest

from rustcv_tpu.ops import farneback, golden


def _smooth_tex(rng, h, w):
    a = rng.integers(0, 256, (h, w), np.uint8)
    for _ in range(3):
        a = golden.gaussian5_u8(a)
    return a


def _bilinear(img, x, y):
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    ax, ay = x - x0, y - y0
    return (img[y0, x0] * (1 - ax) * (1 - ay)
            + img[y0, x0 + 1] * ax * (1 - ay)
            + img[y0 + 1, x0] * (1 - ax) * ay
            + img[y0 + 1, x0 + 1] * ax * ay)


def _shift_pair(rng, h, w, sx, sy):
    """next(p) = prev(p - s)  =>  true flow prev->next is +s."""
    base = _smooth_tex(rng, h + 48, w + 48).astype(np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    prev = np.round(_bilinear(base, xx + 20.0, yy + 20.0)).astype(np.uint8)
    nxt = np.round(_bilinear(base, xx + 20.0 - sx, yy + 20.0 - sy)).astype(np.uint8)
    return prev, nxt


class TestFarneback:
    def test_integer_shift_recovered(self, jax_cpu):
        prev, nxt = _shift_pair(np.random.default_rng(3), 120, 160, 3, 2)
        fl = np.asarray(farneback.farneback_flow(prev, nxt))
        inner = fl[20:-20, 20:-20]
        assert abs(np.median(inner[..., 0]) - 3) < 0.05
        assert abs(np.median(inner[..., 1]) - 2) < 0.05
        assert np.mean(np.abs(inner[..., 0] - 3)) < 0.2

    def test_subpixel_shift(self, jax_cpu):
        prev, nxt = _shift_pair(np.random.default_rng(7), 121, 159, 1.5, -0.75)
        fl = np.asarray(farneback.farneback_flow(prev, nxt))
        inner = fl[20:-20, 20:-20]
        assert abs(np.median(inner[..., 0]) - 1.5) < 0.05
        assert abs(np.median(inner[..., 1]) + 0.75) < 0.05

    def test_large_motion_needs_pyramid(self, jax_cpu):
        prev, nxt = _shift_pair(np.random.default_rng(11), 121, 159, 11, 0)
        fl = np.asarray(farneback.farneback_flow(prev, nxt, levels=4))
        med = np.median(fl[20:-20, 24:-24, 0])
        assert abs(med - 11) < 0.1
        # single-level cannot see an 11 px motion with a 13-wide window
        fl1 = np.asarray(farneback.farneback_flow(prev, nxt, levels=1))
        assert abs(np.median(fl1[20:-20, 24:-24, 0]) - 11) > 2.0

    def test_zero_motion_exact_zero(self, jax_cpu):
        prev, _ = _shift_pair(np.random.default_rng(5), 96, 128, 0, 0)
        fl = np.asarray(farneback.farneback_flow(prev, prev))
        assert np.abs(fl).max() == 0.0

    def test_device_matches_oracle(self, jax_cpu):
        prev, nxt = _shift_pair(np.random.default_rng(13), 90, 110, 2.25, 1.0)
        dev = np.asarray(farneback.farneback_flow(prev, nxt))
        ora = farneback.farneback_flow_numpy(prev, nxt)
        d = np.abs(dev - ora)
        assert np.quantile(d, 0.99) < 1e-3
        assert d.max() < 0.05  # f32-vs-f64 near-singular pixels only

    def test_rotation_field_direction(self, jax_cpu):
        """A rotating texture produces a curl field: flow on the right of
        the center points down when rotating clockwise-in-image-coords."""
        rng = np.random.default_rng(17)
        h = w = 129
        base = _smooth_tex(rng, h + 48, w + 48).astype(np.float64)
        yy, xx = np.mgrid[0:h, 0:w]
        cx, cy = (w - 1) / 2, (h - 1) / 2
        th = 0.02
        # next(p) = prev(R^{-1}(p))  =>  flow ~ (R - I) p
        rx = cx + np.cos(th) * (xx - cx) + np.sin(th) * (yy - cy)
        ry = cy - np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy)
        prev = np.round(_bilinear(base, xx + 20.0, yy + 20.0)).astype(np.uint8)
        nxt = np.round(_bilinear(base, rx + 20.0, ry + 20.0)).astype(np.uint8)
        fl = np.asarray(farneback.farneback_flow(prev, nxt))
        ex = -np.sin(th) * 0 - th * (yy - cy)  # small-angle: fx ~ -th*(y-cy)
        ey = th * (xx - cx)
        inner = np.s_[24:-24, 24:-24]
        assert np.corrcoef(fl[..., 0][inner].ravel(), ex[inner].ravel())[0, 1] > 0.95
        assert np.corrcoef(fl[..., 1][inner].ravel(), ey[inner].ravel())[0, 1] > 0.95

    def test_facade_device_and_host(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        prev, nxt = _shift_pair(np.random.default_rng(19), 80, 96, 1, 1)
        fl_h = imgproc.calc_optical_flow_farneback(
            Mat.from_array(prev), Mat.from_array(nxt))
        import jax.numpy as jnp

        fl_d = imgproc.calc_optical_flow_farneback(
            Mat.from_device(jnp.asarray(prev)), Mat.from_device(jnp.asarray(nxt)))
        assert fl_h.shape == fl_d.shape == (80, 96, 2)
        assert np.quantile(np.abs(fl_h - fl_d), 0.99) < 1e-3
        assert abs(np.median(fl_d[16:-16, 16:-16, 0]) - 1) < 0.1

    def test_levels_clamped_for_small_images(self, jax_cpu):
        prev, nxt = _shift_pair(np.random.default_rng(23), 40, 48, 1, 0)
        fl = np.asarray(farneback.farneback_flow(prev, nxt, levels=6))
        assert fl.shape == (40, 48, 2)
        assert abs(np.median(fl[10:-10, 10:-10, 0]) - 1) < 0.15

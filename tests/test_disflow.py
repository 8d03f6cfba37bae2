"""DIS optical flow: recovers sub-pixel translations and affine motion,
larger-than-patch motion through the pyramid, device twin agrees."""

import numpy as np
import pytest

from rustcv_tpu.ops import disflow
from rustcv_tpu.ops.sift import _blur


def _texture(seed=0, shape=(100, 132)):
    rng = np.random.default_rng(seed)
    base = _blur(rng.integers(0, 256, shape).astype(np.float64), 2.0)
    return (base - base.min()) / np.ptp(base) * 255


def _shift(img, dy, dx):
    h, w = img.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    return disflow._bilinear_np(img, ys - dy, xs - dx)


INNER = np.s_[16:-16, 16:-16]


class TestOracle:
    def test_subpixel_translation(self):
        base = _texture()
        u_true = (1.7, -2.3)
        i0 = base.astype(np.uint8)
        i1 = np.clip(_shift(base, u_true[1], u_true[0]), 0,
                     255).astype(np.uint8)
        flow = disflow.dis_flow_numpy(i0, i1)
        err = np.hypot(flow[INNER][..., 0] - u_true[0],
                       flow[INNER][..., 1] - u_true[1])
        assert err.mean() < 0.15 and np.percentile(err, 90) < 0.3

    def test_large_motion_via_pyramid(self):
        base = _texture(seed=3, shape=(128, 160))
        u_true = (11.0, -7.0)  # larger than the 8-px patch
        i0 = base.astype(np.uint8)
        i1 = np.clip(_shift(base, u_true[1], u_true[0]), 0,
                     255).astype(np.uint8)
        flow = disflow.dis_flow_numpy(i0, i1)
        sl = np.s_[24:-24, 24:-24]
        err = np.hypot(flow[sl][..., 0] - u_true[0],
                       flow[sl][..., 1] - u_true[1])
        assert np.median(err) < 0.5

    def test_affine_field(self):
        base = _texture(seed=5, shape=(120, 120))
        h, w = base.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        # small rotation+zoom about the center
        th, s = np.deg2rad(1.5), 1.02
        cx = cy = 60.0
        sx = s * (np.cos(th) * (xs - cx) - np.sin(th) * (ys - cy)) + cx
        sy = s * (np.sin(th) * (xs - cx) + np.cos(th) * (ys - cy)) + cy
        u_true = sx - xs
        v_true = sy - ys
        i0 = base.astype(np.uint8)
        # I1(sx, sy) = I0(x): build by sampling I0 at the inverse map
        inv_sx = (np.cos(-th) * (xs - cx) - np.sin(-th) * (ys - cy)) / s + cx
        inv_sy = (np.sin(-th) * (xs - cx) + np.cos(-th) * (ys - cy)) / s + cy
        i1 = np.clip(disflow._bilinear_np(base, inv_sy, inv_sx), 0,
                     255).astype(np.uint8)
        flow = disflow.dis_flow_numpy(i0, i1)
        err = np.hypot(flow[INNER][..., 0] - u_true[INNER],
                       flow[INNER][..., 1] - v_true[INNER])
        assert np.median(err) < 0.4

    def test_zero_motion(self):
        base = _texture(seed=7).astype(np.uint8)
        flow = disflow.dis_flow_numpy(base, base)
        assert np.abs(flow[INNER]).max() < 0.05


class TestDeviceTwin:
    def test_matches_oracle(self, jax_cpu):
        base = _texture(shape=(80, 96))
        i0 = base.astype(np.uint8)
        i1 = np.clip(_shift(base, -1.2, 2.1), 0, 255).astype(np.uint8)
        g = disflow.dis_flow_numpy(i0, i1)
        d = np.asarray(disflow.dis_flow(i0, i1))
        sl = np.s_[16:-16, 16:-16]
        assert np.abs(d[sl] - g[sl]).max() < 0.05

    def test_device_recovers_translation(self, jax_cpu):
        base = _texture(seed=2)
        i0 = base.astype(np.uint8)
        i1 = np.clip(_shift(base, 2.0, -3.0), 0, 255).astype(np.uint8)
        flow = np.asarray(disflow.dis_flow(i0, i1))
        err = np.hypot(flow[INNER][..., 0] + 3.0, flow[INNER][..., 1] - 2.0)
        assert err.mean() < 0.2

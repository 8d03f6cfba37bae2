"""RGB-D odometry: recover synthetic ground-truth motion."""

import numpy as np
import pytest

from rustcv_tpu.ops import odometry
from rustcv_tpu.ops.calib import rodrigues

cv2 = pytest.importorskip("cv2")


def _render_depth(k, rvec, tvec, shape=(120, 160)):
    """Depth of a structured scene (two walls + a slanted floor) seen
    from the pose (rvec, tvec): ray-cast three planes."""
    h, w = shape
    vs, us = np.mgrid[0:h, 0:w].astype(np.float64)
    kinv = np.linalg.inv(k)
    rays = np.stack([us, vs, np.ones_like(us)], -1) @ kinv.T
    r = rodrigues(np.asarray(rvec, np.float64))
    cam_rays = rays @ r.T  # world direction
    origin = np.asarray(tvec, np.float64)
    # planes in world space: n·x = d
    planes = [(np.array([0.0, 0, -1]), -3.0),    # wall at z=3
              (np.array([-1.0, 0, -0.2]), -2.0),  # slanted wall
              (np.array([0.0, -1, -0.1]), -1.2)]  # floor-ish
    depth = np.full((h, w), np.inf)
    for n, d in planes:
        denom = cam_rays @ n
        tt = (d - origin @ n) / np.where(np.abs(denom) > 1e-9, denom,
                                         1e-9)
        zcam = tt * rays[..., 2]
        hit = (tt > 0.1) & (np.abs(denom) > 1e-9)
        depth = np.where(hit & (tt < depth), tt, depth)
    return np.where(np.isinf(depth), 0.0, depth * rays[..., 2] /
                    rays[..., 2])


def test_recovers_small_motion():
    k = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1.0]])
    d0 = _render_depth(k, (0, 0, 0), (0, 0, 0))
    rv_true = np.array([0.01, -0.02, 0.005])
    tv_true = np.array([0.01, 0.005, -0.02])
    # frame 1 = scene seen from the inverse of (R,t): points transform
    # as p1 = R p0 + t ⇒ camera 1 pose in world = (Rᵀ, −Rᵀt)
    r = rodrigues(rv_true)
    cam_r = rodrigues(r.T)
    cam_t = -r.T @ tv_true
    d1 = _render_depth(k, cam_r, cam_t)
    ok, rv, tv = odometry.rgbd_odometry(d0, d1, k, levels=2, iters=15)
    assert ok
    np.testing.assert_allclose(rv, rv_true, atol=2e-3)
    np.testing.assert_allclose(tv, tv_true, atol=2e-3)


def test_identity_motion():
    k = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1.0]])
    d0 = _render_depth(k, (0, 0, 0), (0, 0, 0))
    ok, rv, tv = odometry.rgbd_odometry(d0, d0, k, levels=2, iters=5)
    assert ok
    assert np.abs(rv).max() < 1e-6 and np.abs(tv).max() < 1e-6

"""TSDF volume: integrate synthetic depth, raycast it back, extract
the surface cloud."""

import numpy as np
import pytest

from rustcv_tpu.ops.calib import rodrigues
from rustcv_tpu.ops.tsdf import TsdfVolume

cv2 = pytest.importorskip("cv2")

K = np.array([[120.0, 0, 60], [0, 120.0, 45], [0, 0, 1.0]])


def _wall_depth(shape=(90, 120), z=1.0):
    return np.full(shape, z, np.float64)


@pytest.fixture(scope="module")
def fused():
    vol = TsdfVolume(resolution=96, voxel_size=0.02,
                     origin=(-0.96, -0.72, 0.0))
    d = _wall_depth(z=1.0)
    # two slightly different viewpoints of the same wall at z=1
    vol.integrate(d, K, np.eye(3), np.zeros(3))
    r2 = rodrigues(np.array([0.0, 0.02, 0.0]))
    # wall in cam2: depth along each ray changes; re-render analytically
    h, w = d.shape
    vs, us = np.mgrid[0:h, 0:w].astype(np.float64)
    rays = np.stack([(us - K[0, 2]) / K[0, 0],
                     (vs - K[1, 2]) / K[1, 1],
                     np.ones_like(us)], -1)
    # plane z_world = 1; cam2 pose world→cam R=r2, t=0 ⇒ ray world dir
    dirs = rays @ r2
    tt = 1.0 / dirs[..., 2]
    d2 = tt * rays[..., 2]
    vol.integrate(d2, K, r2, np.zeros(3))
    return vol


def test_raycast_reproduces_wall(fused):
    depth = fused.raycast(K, np.eye(3), np.zeros(3), (90, 120),
                          max_depth=2.0)
    hit = depth > 0
    assert hit.mean() > 0.9
    err = np.abs(depth[hit] - 1.0)
    assert np.median(err) < 0.01, np.median(err)


def test_extract_cloud_on_plane(fused):
    cloud = fused.extract_cloud()
    assert len(cloud) > 500
    # the surface is the z=1 plane (within a truncation band)
    assert np.median(np.abs(cloud[:, 2] - 1.0)) < 0.015


def test_integration_weights_bounded(fused):
    assert fused.weight.max() <= 64.0
    assert fused.tsdf.min() >= -1.0 and fused.tsdf.max() <= 1.0

"""3d module: point-cloud I/O interop with cv2, depthTo3d exactness,
plane segmentation, triangle rasterizer (device == oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import threed

cv2 = pytest.importorskip("cv2")


def test_ply_interop(tmp_path, rng):
    pts = rng.random((17, 3)).astype(np.float32) * 4 - 2
    ours = str(tmp_path / "ours.ply")
    threed.save_point_cloud(ours, pts)
    back = threed.load_point_cloud(ours)
    np.testing.assert_allclose(back, pts, rtol=1e-6)
    # cv2 reads our file
    cvback = cv2.loadPointCloud(ours)[0].reshape(-1, 3)
    np.testing.assert_allclose(cvback, pts, rtol=1e-6)
    # we read cv2's file
    theirs = str(tmp_path / "cv.ply")
    cv2.savePointCloud(theirs, pts.reshape(-1, 1, 3))
    np.testing.assert_allclose(threed.load_point_cloud(theirs), pts,
                               rtol=1e-6)
    # OBJ round trip
    obj = str(tmp_path / "a.obj")
    threed.save_point_cloud(obj, pts)
    np.testing.assert_allclose(threed.load_point_cloud(obj), pts,
                               rtol=1e-6)


def test_depth_to_3d_vs_cv2(rng):
    depth = (rng.random((12, 16)).astype(np.float32) * 3 + 0.5)
    k = np.array([[300.0, 0, 8], [0, 280.0, 6], [0, 0, 1.0]])
    ours = threed.depth_to_3d(depth, k)
    ref = cv2.depthTo3d(depth, k)
    np.testing.assert_allclose(ours, ref[..., :3], rtol=1e-5)


def test_find_planes(rng):
    # two synthetic planes seen by a pinhole camera
    k = np.array([[200.0, 0, 40], [0, 200.0, 30], [0, 0, 1.0]])
    h, w = 60, 80
    vs, us = np.mgrid[0:h, 0:w].astype(np.float64)
    # left half: fronto-parallel wall at z=2; right half: slanted floor
    z = np.where(us < 40, 2.0, 1.0 + 0.02 * vs)
    z += rng.normal(0, 0.002, z.shape)
    pts = threed.depth_to_3d(z.astype(np.float32), k)
    labels, coeffs = threed.find_planes(pts, min_size=300,
                                        threshold=0.02)
    assert len(coeffs) >= 2
    # every accepted plane has the camera-facing orientation
    assert (coeffs[:, 2] <= 0).all()
    # the wall: normal ≈ (0,0,-1), d ≈ 2
    dots = np.abs(coeffs[:, 2])
    wall = np.argmax(dots)
    assert dots[wall] > 0.99
    assert abs(coeffs[wall, 3] - 2.0) < 0.05
    # coverage: most pixels labeled
    assert (labels != 255).mean() > 0.9


def test_triangle_rasterize_oracle_properties():
    verts = np.array([[5.0, 5.0, 1.0], [55.0, 8.0, 1.0],
                      [20.0, 40.0, 1.0],
                      [10.0, 10.0, 0.5], [50.0, 12.0, 0.5],
                      [25.0, 35.0, 0.5]], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    cols = np.array([[255, 0, 0]] * 3 + [[0, 255, 0]] * 3, np.float32)
    color, depth = threed.triangle_rasterize_numpy(verts, idx, cols,
                                                   64, 48)
    # the nearer (z=0.5) green triangle wins where both cover
    assert color[20, 30, 1] == 255 and color[20, 30, 0] == 0
    assert depth[20, 30] == 0.5
    # red visible outside the green one
    assert color[8, 40, 0] > 0
    # empty background
    assert depth[0, 0] == np.inf and (color[0, 0] == 0).all()


def test_triangle_rasterize_device_matches(jax_cpu):
    rng = np.random.default_rng(3)
    verts = np.concatenate([rng.uniform(0, 64, (12, 2)),
                            rng.uniform(0.2, 3, (12, 1))],
                           1).astype(np.float32)
    idx = np.arange(12, dtype=np.int32).reshape(4, 3)
    cols = rng.uniform(0, 255, (12, 3)).astype(np.float32)
    c_np, d_np = threed.triangle_rasterize_numpy(verts, idx, cols,
                                                 64, 48)
    c_dev, d_dev = threed.triangle_rasterize(
        jnp.asarray(verts), jnp.asarray(idx), jnp.asarray(cols), 64, 48)
    c_dev, d_dev = np.asarray(c_dev), np.asarray(d_dev)
    # f32 barycentric edges: allow a 1-px disagreement band
    cover_np = np.isfinite(d_np)
    cover_dev = np.isfinite(d_dev)
    both = cover_np & cover_dev
    assert (cover_np != cover_dev).mean() < 0.03
    np.testing.assert_allclose(d_dev[both], d_np[both], atol=1e-3)
    np.testing.assert_allclose(c_dev[both], c_np[both], atol=1.0)


def test_register_depth_vs_cv2(rng):
    kd = np.array([[200.0, 0, 40], [0, 200.0, 30], [0, 0, 1.0]])
    kr = np.array([[220.0, 0, 42], [0, 220.0, 32], [0, 0, 1.0]])
    depth = (rng.random((60, 80)).astype(np.float32) * 0 + 2.0)
    depth[20:40, 20:50] = 1.5
    rt = np.eye(4)
    rt[:3, 3] = [0.05, 0.0, 0.0]
    ours = threed.register_depth(kd, kr, rt, depth, (80, 60))
    ref = cv2.registerDepth(kd, kr, np.zeros(5), rt, depth, (80, 60))
    both = (ours > 0) & (ref > 0)
    assert both.mean() > 0.7
    np.testing.assert_allclose(ours[both], ref[both], atol=0.02)


def test_warp_frame_identity_and_shift(rng):
    k = np.array([[150.0, 0, 30], [0, 150.0, 25], [0, 0, 1.0]])
    depth = np.full((50, 60), 2.0, np.float32)
    img = rng.integers(0, 256, (50, 60, 3), np.uint8)
    # identity transform reproduces the frame
    wd, wi, wm = threed.warp_frame(depth, img, np.eye(4), k)
    assert (wm > 0).mean() > 0.99
    np.testing.assert_allclose(wd[wm > 0], 2.0, atol=1e-5)
    np.testing.assert_array_equal(wi[wm > 0], img[wm > 0])
    # translating along +x shifts content by fx·tx/z px — pick tx for
    # an exact integer shift (fractional shifts leave splat holes)
    shift = 8
    rt = np.eye(4)
    rt[0, 3] = shift * 2.0 / 150.0
    wd2, wi2, wm2 = threed.warp_frame(depth, img, rt, k)
    inner = (wm2[10:-10, 10 + shift:-10] > 0)
    assert inner.mean() > 0.99
    np.testing.assert_array_equal(
        wi2[10:-10, 10 + shift:-10][inner],
        img[10:-10, 10:-10 - shift][inner])


def test_rescale_depth():
    d = np.array([[1000.0, 0.0], [np.nan, 2500.0]], np.float32)
    out = threed.rescale_depth(d, 0.001)
    np.testing.assert_allclose(out, [[1.0, 0.0], [0.0, 2.5]])


def test_depth_to_3d_sparse(rng):
    k = np.array([[300.0, 0, 8], [0, 280.0, 6], [0, 0, 1.0]])
    depth = (rng.random((12, 16)).astype(np.float32) * 3 + 0.5)
    pts = np.array([[3, 4], [10, 2], [15, 11]], np.float64)
    d = depth[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    sparse = threed.depth_to_3d_sparse(pts, d, k)
    dense = threed.depth_to_3d(depth, k)
    for i, (x, y) in enumerate(pts.astype(int)):
        np.testing.assert_allclose(sparse[i], dense[y, x], rtol=1e-6)


def test_rgbd_normals(jax_cpu):
    # a known slanted plane: z = 1 + 0.1x' through the camera model
    k = np.array([[100.0, 0, 30], [0, 100.0, 25], [0, 0, 1.0]])
    vs, us = np.mgrid[0:50, 0:60].astype(np.float64)
    # plane x + 10z = 10 → z = 10/(10 + (u-cx)/fx·...) — build from
    # geometry: point = z·K⁻¹u with x + 10z = 10
    xn = (us - 30) / 100.0
    z = 10.0 / (xn + 10.0)
    pts = threed.depth_to_3d(z.astype(np.float32), k)
    n = threed.rgbd_normals_numpy(pts)
    true_n = np.array([1.0, 0.0, 10.0])
    true_n = -true_n / np.linalg.norm(true_n)  # toward camera (nz<0)
    err = np.abs(n[5:-5, 5:-5] - true_n).max()
    assert err < 1e-3, err
    dev = np.asarray(threed.rgbd_normals(pts))
    np.testing.assert_allclose(dev[2:-2, 2:-2], n[2:-2, 2:-2],
                               atol=1e-4)


def test_octree_queries(rng):
    from rustcv_tpu.ops.octree import Octree

    pts = rng.normal(0, 1, (400, 3))
    tree = Octree(pts, max_points=8)
    q = np.array([0.1, -0.2, 0.3])
    # exactness vs brute force
    d2 = ((pts - q) ** 2).sum(1)
    order = np.argsort(d2)[:5]
    idx, dist = tree.k_nearest_neighbours(q, 5)
    np.testing.assert_array_equal(np.sort(idx), np.sort(order))
    np.testing.assert_allclose(dist, np.sort(d2)[:5], rtol=1e-12)
    r = float(np.sqrt(np.sort(d2)[9]))
    ids, dd = tree.radius_neighbours(q, r + 1e-9)
    assert len(ids) == 10
    assert set(ids.tolist()) == set(np.argsort(d2)[:10].tolist())
    # deletion removes from queries
    assert tree.delete_point(pts[order[0]])
    idx2, _ = tree.k_nearest_neighbours(q, 5)
    assert order[0] not in idx2
    # bounds
    assert tree.is_point_in_bounds(pts[0])
    assert not tree.is_point_in_bounds((99.0, 0, 0))

"""Camera model — projection round trips, undistortion straightens
lines, rectify maps, optimal new camera matrix coverage properties."""

import numpy as np
import pytest

from rustcv_tpu.ops import calib

K = np.array([[300.0, 0.0, 160.0], [0.0, 300.0, 120.0], [0.0, 0.0, 1.0]])
DIST = (-0.25, 0.08, 0.001, -0.002, 0.0)  # mild barrel + slight tangential


class TestRodrigues:
    def test_round_trip(self):
        r = np.array([0.2, -0.5, 0.35])
        R = calib.rodrigues(r)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert abs(np.linalg.det(R) - 1) < 1e-12
        np.testing.assert_allclose(calib.rodrigues(R), r, atol=1e-10)

    def test_zero_vector(self):
        assert np.allclose(calib.rodrigues(np.zeros(3)), np.eye(3))
        assert np.allclose(calib.rodrigues(np.eye(3)), np.zeros(3))


class TestProjection:
    def test_pinhole_no_distortion(self):
        pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.2, 2.0]])
        uv = calib.project_points(pts, np.zeros(3), np.zeros(3), K)
        np.testing.assert_allclose(uv[0], [160.0, 120.0], atol=1e-12)
        np.testing.assert_allclose(uv[1], [160 + 300 * 0.05, 120 - 300 * 0.1])

    def test_undistort_points_round_trip(self):
        rng = np.random.default_rng(0)
        pts3 = np.stack([rng.uniform(-0.4, 0.4, 50), rng.uniform(-0.3, 0.3, 50),
                         np.full(50, 2.0)], axis=-1)
        ideal = calib.project_points(pts3, np.zeros(3), np.zeros(3), K)
        distorted = calib.project_points(pts3, np.zeros(3), np.zeros(3), K, DIST)
        undone = calib.undistort_points(distorted, K, DIST)
        np.testing.assert_allclose(undone, ideal, atol=1e-6)

    def test_rotation_translation(self):
        p = np.array([[0.0, 0.0, 2.0]])
        uv = calib.project_points(p, np.array([0.0, np.pi / 2, 0.0]),
                                  np.array([0.0, 0.0, 2.0]), K)
        # 90 deg about y: (0,0,2) -> (2,0,0), +t -> (2,0,2) -> x/z=1
        np.testing.assert_allclose(uv[0], [160 + 300, 120], atol=1e-9)


class TestUndistortImage:
    def _grid_image(self, h, w, step=24):
        img = np.full((h, w), 255, np.uint8)
        img[::step, :] = 0
        img[:, ::step] = 0
        return img

    def test_identity_when_no_distortion(self, jax_cpu):
        img = self._grid_image(120, 160)
        out = np.asarray(calib.undistort(img, K, (0, 0, 0, 0, 0)))
        assert np.array_equal(out, img)

    def test_straightens_distorted_grid(self, jax_cpu):
        """Render a grid through the distortion model, undistort, and
        verify a horizontal grid line is straight again (same row across
        the width)."""
        h, w = 240, 320
        Kk = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1]])
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        und = calib.undistort_points(np.stack([xs.ravel(), ys.ravel()], -1), Kk, DIST)
        # distorted image: sample the ideal grid at the undistorted coords
        gx = und[:, 0].reshape(h, w)
        gy = und[:, 1].reshape(h, w)
        ideal = self._grid_image(h, w, 40).astype(np.float64)
        xi = np.clip(np.round(gx).astype(int), 0, w - 1)
        yi = np.clip(np.round(gy).astype(int), 0, h - 1)
        distorted = ideal[yi, xi].astype(np.uint8)
        restored = np.asarray(calib.undistort(distorted, Kk, DIST))
        # straightness: each grid line's dark pixels re-concentrate into
        # its own single row (edges may be lost to invalid source areas,
        # so compare against the neighborhood, not the full width)
        cols = np.array([c for c in range(40, w - 40)
                         if min(c % 40, 40 - c % 40) > 4])  # skip vertical lines
        col_dark = (restored[:, cols] < 64).sum(axis=1)
        for row in (80, 120):
            near = col_dark[row - 6 : row + 7].sum()
            assert col_dark[row] > 50, f"line at row {row} lost"
            assert col_dark[row] > 0.8 * near, f"line at row {row} smeared"

    def test_rectify_map_matches_undistort_points(self):
        mx, my = calib.init_undistort_rectify_map(K, DIST, None, (64, 48))
        # the map at output pixel (u, v) must be the DISTORTED position of
        # the ideal pixel: distort(normalized(u, v))
        uv = np.array([[10.0, 7.0], [40.0, 30.0]])
        x = (uv[:, 0] - K[0, 2]) / K[0, 0]
        y = (uv[:, 1] - K[1, 2]) / K[1, 1]
        xd, yd = calib._distort(x, y, DIST)
        want_x = K[0, 0] * xd + K[0, 2]
        want_y = K[1, 1] * yd + K[1, 2]
        for i, (u, v) in enumerate(uv.astype(int)):
            assert abs(mx[v, u] - want_x[i]) < 1e-4
            assert abs(my[v, u] - want_y[i]) < 1e-4

    def test_optimal_new_camera_matrix(self):
        w, h = 320, 240
        nk0, _ = calib.get_optimal_new_camera_matrix(K, DIST, (w, h), alpha=0.0)
        nk1, _ = calib.get_optimal_new_camera_matrix(K, DIST, (w, h), alpha=1.0)
        # alpha=1 keeps everything -> wider view -> smaller focal
        assert nk1[0, 0] < nk0[0, 0]
        # alpha=1: ALL undistorted border points land inside the output
        edge = [(x, y) for x in np.linspace(0, w - 1, 9)
                for y in (0, h - 1)] + [(x, y) for y in np.linspace(0, h - 1, 9)
                                        for x in (0, w - 1)]
        up = calib.undistort_points(np.asarray(edge), K, DIST, new_K=nk1)
        assert up[:, 0].min() > -1.0 and up[:, 0].max() < w + 1.0
        assert up[:, 1].min() > -1.0 and up[:, 1].max() < h + 1.0


def _rotmat(rvec):
    return calib.rodrigues(np.asarray(rvec, np.float64))


def _stereo_views(seed=5, views=6):
    """Planar-target stereo rig with distortion on both cameras."""
    rng = np.random.default_rng(seed)
    k1 = np.array([[800.0, 0, 320], [0, 790.0, 240], [0, 0, 1]])
    k2 = np.array([[760.0, 0, 310], [0, 765.0, 250], [0, 0, 1]])
    d1 = (0.02, -0.01, 0.001, -0.0005, 0.0)
    d2 = (-0.015, 0.008, 0.0, 0.0008, 0.0)
    rg = _rotmat([0.02, -0.12, 0.01])
    tg = np.array([-0.2, 0.01, 0.02])
    obj = np.stack(np.meshgrid(np.arange(7) * 0.03,
                               np.arange(5) * 0.03), -1).reshape(-1, 2)
    obj = np.concatenate([obj - obj.mean(0), np.zeros((len(obj), 1))], 1)
    objs, i1, i2 = [], [], []
    for _ in range(views):
        rv = rng.uniform(-0.3, 0.3, 3)
        tv = np.array([rng.uniform(-0.05, 0.05) + 0.1,
                       rng.uniform(-0.05, 0.05), rng.uniform(0.5, 0.9)])
        p1 = calib.project_points(obj, rv, tv, k1, d1)
        r2 = calib.rodrigues(rg @ _rotmat(rv))
        t2 = rg @ tv + tg
        p2 = calib.project_points(obj, r2, t2, k2, d2)
        objs.append(obj)
        i1.append(p1)
        i2.append(p2)
    return objs, i1, i2, k1, d1, k2, d2, rg, tg


class TestPlanarPnP:
    def test_planar_target_exact(self):
        objs, i1, _, k1, d1, *_ = _stereo_views()
        rng = np.random.default_rng(5)
        rv = rng.uniform(-0.3, 0.3, 3)
        tv = np.array([0.12, -0.03, 0.7])
        px = calib.project_points(objs[0], rv, tv, k1, d1)
        r, t = calib.solve_pnp(objs[0], px, k1, d1)
        assert np.abs(r - rv).max() < 1e-8
        assert np.abs(t - tv).max() < 1e-8

    def test_four_point_planar_minimum(self):
        k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        obj = np.array([[0, 0, 0], [0.1, 0, 0], [0.1, 0.1, 0],
                        [0, 0.1, 0]], np.float64)
        rv = np.array([0.05, -0.1, 0.02])
        tv = np.array([0.02, -0.01, 0.6])
        px = calib.project_points(obj, rv, tv, k, (0,) * 5)
        r, t = calib.solve_pnp(obj, px, k)
        assert np.abs(r - rv).max() < 1e-8
        assert np.abs(t - tv).max() < 1e-8


class TestStereoCalibrate:
    def test_recovers_extrinsics_exactly(self):
        objs, i1, i2, k1, d1, k2, d2, rg, tg = _stereo_views()
        rms, r, t, e, f = calib.stereo_calibrate(objs, i1, i2,
                                                 k1, d1, k2, d2)
        assert rms < 1e-9
        assert np.abs(r - rg).max() < 1e-9
        assert np.abs(t - tg).max() < 1e-9

    def test_f_satisfies_epipolar_constraint(self):
        objs, i1, i2, k1, d1, k2, d2, _, _ = _stereo_views(seed=8)
        _, _, _, _, f = calib.stereo_calibrate(objs, i1, i2,
                                               k1, d1, k2, d2)
        u1 = calib.undistort_points(i1[0], k1, d1)
        u2 = calib.undistort_points(i2[0], k2, d2)
        h1 = np.column_stack([u1, np.ones(len(u1))])
        h2 = np.column_stack([u2, np.ones(len(u2))])
        assert np.abs(np.sum(h2 * (h1 @ f.T), axis=1)).max() < 1e-9


class TestDecomposeHomography:
    def test_plane_motion_recovered(self):
        k = np.array([[800.0, 0, 320], [0, 790.0, 240], [0, 0, 1]])
        rg = _rotmat([0.02, -0.12, 0.01])
        n = np.array([0.1, -0.2, 0.96])
        n = n / np.linalg.norm(n)
        t = np.array([0.3, -0.1, 0.2])
        d = 2.0
        h = 3.7 * k @ (rg + np.outer(t / d, n)) @ np.linalg.inv(k)
        num, rs, ts, ns = calib.decompose_homography_mat(h, k)
        assert 1 <= num <= 4
        errs = [np.abs(r - rg).max() + np.abs(tt - t / d).max()
                + np.abs(nn - n).max()
                for r, tt, nn in zip(rs, ts, ns)]
        assert min(errs) < 1e-9
        for r in rs:  # all candidates are rotations
            assert np.abs(r @ r.T - np.eye(3)).max() < 1e-9
            assert np.linalg.det(r) > 0

    def test_pure_rotation_single_solution(self):
        k = np.array([[800.0, 0, 320], [0, 790.0, 240], [0, 0, 1]])
        rg = _rotmat([0.3, 0.1, -0.2])
        h = k @ rg @ np.linalg.inv(k)
        num, rs, ts, ns = calib.decompose_homography_mat(h, k)
        assert num == 1
        assert np.abs(rs[0] - rg).max() < 1e-9
        assert np.abs(ts[0]).max() < 1e-12


class TestEstimateAffine3D:
    def test_exact_with_outliers(self):
        rng = np.random.default_rng(5)
        a = np.concatenate([_rotmat([0.2, 0.1, -0.3]) * 1.3,
                            np.array([[1.0], [2.0], [-0.5]])], 1)
        x = rng.uniform(-5, 5, (40, 3))
        y = x @ a[:, :3].T + a[:, 3]
        yo = y.copy()
        yo[:6] += rng.uniform(20, 50, (6, 3))
        ret, ae, mask = calib.estimate_affine_3d(x, yo, ransac_thresh=1.0)
        assert ret == 1
        assert np.abs(ae - a).max() < 1e-9
        assert not mask[:6].any() and mask[6:].all()

    def test_too_few_points(self):
        ret, a, mask = calib.estimate_affine_3d(np.zeros((3, 3)),
                                                np.zeros((3, 3)))
        assert ret == 0 and a.shape == (3, 4)

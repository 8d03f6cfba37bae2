"""Epipolar geometry + pose/rectification extensions: fundamental matrix
(8-point + RANSAC), epilines, triangulation, solvePnPRansac,
stereoRectify/reprojectImageTo3D — all on synthetic rigs with known
ground truth."""

import numpy as np

from rustcv_tpu.ops import calib, epipolar


def _rig(seed=3, n=60):
    """Two-view rig: K, (R, T) with x2 = R x1 + T, 3D points in front,
    and their exact pixel projections."""
    rng = np.random.default_rng(seed)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    rvec = np.array([0.02, -0.25, 0.015])
    R = calib.rodrigues(rvec)
    T = np.array([-1.0, 0.04, 0.08])
    pts = np.column_stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
        rng.uniform(4, 9, n),
    ])
    p1 = calib.project_points(pts, np.zeros(3), np.zeros(3), K, (0,) * 5)
    p2 = calib.project_points(pts, rvec, T, K, (0,) * 5)
    return K, R, T, pts, p1, p2


def _true_f(K, R, T):
    tx = np.array([[0, -T[2], T[1]], [T[2], 0, -T[0]], [-T[1], T[0], 0]])
    e = tx @ R
    f = np.linalg.inv(K).T @ e @ np.linalg.inv(K)
    return f / np.linalg.norm(f)


class TestFundamental:
    def test_8point_satisfies_epipolar_constraint(self):
        K, R, T, _, p1, p2 = _rig()
        f, mask = epipolar.find_fundamental_mat(p1, p2, method="8point")
        assert f is not None and mask.all()
        h1 = np.column_stack([p1, np.ones(len(p1))])
        h2 = np.column_stack([p2, np.ones(len(p2))])
        assert np.abs(np.sum(h2 * (h1 @ f.T), axis=1)).max() < 1e-6
        ftrue = _true_f(K, R, T)
        ftrue *= np.sign(ftrue.flat[np.argmax(np.abs(f))]
                         * f.flat[np.argmax(np.abs(f))])
        assert np.abs(np.abs(f) - np.abs(ftrue)).max() < 1e-4

    def test_ransac_rejects_outliers(self):
        _, _, _, _, p1, p2 = _rig(n=80)
        rng = np.random.default_rng(5)
        bad = rng.choice(80, 20, replace=False)
        p2c = p2.copy()
        p2c[bad] += rng.uniform(25, 70, (20, 2)) * rng.choice([-1, 1], (20, 2))
        f, mask = epipolar.find_fundamental_mat(p1, p2c, ransac_thresh=1.5)
        assert f is not None
        good = np.setdiff1d(np.arange(80), bad)
        assert mask[good].mean() > 0.95 and not mask[bad].any()

    def test_epilines_contain_correspondences(self):
        _, _, _, _, p1, p2 = _rig()
        f, _ = epipolar.find_fundamental_mat(p1, p2, method="8point")
        l2 = epipolar.compute_correspond_epilines(p1, 1, f)
        d = np.abs(np.sum(l2[:, :2] * p2, axis=1) + l2[:, 2])
        assert d.max() < 1e-5  # point-to-line distance in px
        l1 = epipolar.compute_correspond_epilines(p2, 2, f)
        d1 = np.abs(np.sum(l1[:, :2] * p1, axis=1) + l1[:, 2])
        assert d1.max() < 1e-5


class TestTriangulate:
    def test_recovers_3d_points(self):
        K, R, T, pts, p1, p2 = _rig()
        P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = K @ np.hstack([R, T[:, None]])
        X = epipolar.triangulate_points(P1, P2, p1, p2)
        xyz = X[:, :3] / X[:, 3:]
        assert np.abs(xyz - pts).max() < 1e-6


class TestPnPRansac:
    def test_robust_to_outliers(self):
        K, R, T, pts, _, p2 = _rig(n=50)
        rvec = calib.rodrigues(R)
        rng = np.random.default_rng(8)
        bad = rng.choice(50, 15, replace=False)
        p2c = p2.copy()
        p2c[bad] += rng.uniform(30, 80, (15, 2)) * rng.choice([-1, 1], (15, 2))
        r, t, mask = calib.solve_pnp_ransac(pts, p2c, K,
                                            reproj_threshold=2.0)
        assert r is not None
        assert np.abs(r - rvec).max() < 1e-6
        assert np.abs(t - T).max() < 1e-6
        good = np.setdiff1d(np.arange(50), bad)
        assert mask[good].all() and not mask[bad].any()

    def test_too_few_points(self):
        r, t, mask = calib.solve_pnp_ransac(
            np.zeros((4, 3)), np.zeros((4, 2)), np.eye(3))
        assert r is None and t is None and not mask.any()


class TestRectify:
    def test_rectified_rows_align_and_q_reprojects(self):
        K, R, T, pts, _, _ = _rig(n=40)
        r1, r2, P1, P2, Q = calib.stereo_rectify(
            K, (0,) * 5, K, (0,) * 5, (640, 480), R, T)
        # rotations are rotations
        for rr in (r1, r2):
            assert np.abs(rr @ rr.T - np.eye(3)).max() < 1e-12
            assert abs(np.linalg.det(rr) - 1) < 1e-12

        def proj(P, x3):
            v = P @ np.append(x3, 1.0)
            return v[:2] / v[2]

        for X in pts:
            xr1 = r1 @ X                      # rectified cam1 frame
            xr2 = r2 @ (R @ X + T)            # same point seen from cam2
            a = proj(P1, xr1)
            b = proj(P2, xr1)                 # P2 carries the baseline
            # P2 on the cam1-frame point == P1's intrinsics on the
            # physically-transformed cam2 point (no double counting)
            b_phys = proj(P1, xr2)
            assert np.abs(b - b_phys).max() < 1e-8
            # THE rectification contract: epipolar lines are now rows
            assert abs(a[1] - b[1]) < 1e-8
            # Q turns (x, y, disparity) back into rectified-cam1 3D
            v = Q @ np.array([a[0], a[1], a[0] - b[0], 1.0])
            assert np.abs(v[:3] / v[3] - xr1).max() < 1e-6

    def test_reproject_image_to_3d_matches_q(self):
        Q = np.array([[1, 0, 0, -320], [0, 1, 0, -240],
                      [0, 0, 0, 500.0], [0, 0, 2.0, 0]])
        disp = np.random.default_rng(0).uniform(1, 64, (6, 8))
        out = calib.reproject_image_to_3d(disp, Q)
        ys, xs = np.mgrid[0:6, 0:8]
        w = 2.0 * disp
        np.testing.assert_allclose(out[..., 0], (xs - 320) / w, rtol=1e-6)
        np.testing.assert_allclose(out[..., 2], 500.0 / w, rtol=1e-6)


class TestFisheye:
    K = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1]])
    D = (0.05, -0.01, 0.003, -0.001)

    def test_project_undistort_roundtrip(self):
        rng = np.random.default_rng(4)
        pts3 = np.column_stack([rng.uniform(-1.5, 1.5, 50),
                                rng.uniform(-1.0, 1.0, 50),
                                rng.uniform(2.0, 6.0, 50)])
        px = calib.fisheye_project_points(pts3, np.zeros(3), np.zeros(3),
                                          self.K, self.D)
        und = calib.fisheye_undistort_points(px, self.K, self.D)
        # undistorted normalized == pinhole normalized of the 3D points
        want = pts3[:, :2] / pts3[:, 2:]
        np.testing.assert_allclose(und, want, atol=1e-9)

    def test_distortion_pulls_inward(self):
        # equidistant projection compresses off-axis points vs pinhole
        p = calib.fisheye_project_points(np.array([[1.2, 0.0, 2.0]]),
                                         np.zeros(3), np.zeros(3),
                                         self.K, (0, 0, 0, 0))
        pinhole = 300.0 * 0.6 + 320
        assert p[0, 0] < pinhole and p[0, 0] > 320

    def test_undistort_image_straightens(self):
        # a vertical line of 3D points projects curved through the
        # fisheye; after undistortion with new_K = K it is straight
        ys = np.linspace(-1.0, 1.0, 9)
        pts3 = np.column_stack([np.full(9, 0.9), ys, np.full(9, 2.0)])
        px = calib.fisheye_project_points(pts3, np.zeros(3), np.zeros(3),
                                          self.K, self.D)
        assert np.ptp(px[:, 0]) > 2.0  # curved in the fisheye image
        und = calib.fisheye_undistort_points(px, self.K, self.D)
        upx = und * [self.K[0, 0], self.K[1, 1]] + [self.K[0, 2],
                                                    self.K[1, 2]]
        assert np.ptp(upx[:, 0]) < 1e-6  # straight after undistortion

    def test_image_undistort_runs(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (120, 160, 3)).astype(np.uint8)
        K = np.array([[80.0, 0, 80], [0, 80.0, 60], [0, 0, 1]])
        out = calib.fisheye_undistort(img, K, self.D)
        assert out.shape == img.shape and out.dtype == np.uint8


class TestEssential:
    def test_essential_recovers_pose_exactly(self):
        K, R, T, _, p1, p2 = _rig()
        e, mask = epipolar.find_essential_mat(p1, p2, K)
        assert e is not None and mask.all()
        n_good, Rr, tr, pm = epipolar.recover_pose(e, p1, p2, K, mask)
        assert n_good == len(p1) and pm.all()
        assert np.abs(Rr - R).max() < 1e-9
        tu = T / np.linalg.norm(T)
        assert min(np.abs(tr - tu).max(), np.abs(tr + tu).max()) < 1e-9

    def test_essential_ransac_rejects_outliers(self):
        K, R, T, _, p1, p2 = _rig(seed=9)
        rng = np.random.default_rng(0)
        bad = p2.copy()
        bad[:10] += rng.uniform(40, 90, (10, 2))
        e, mask = epipolar.find_essential_mat(p1, bad, K)
        assert e is not None
        assert not mask[:10].any() and mask[10:].all()
        n_good, Rr, tr, _ = epipolar.recover_pose(e, p1, bad, K, mask)
        assert n_good == len(p1) - 10
        assert np.abs(Rr - R).max() < 1e-8

    def test_decompose_essential_contains_truth(self):
        K, R, T, _, p1, p2 = _rig()
        e, _ = epipolar.find_essential_mat(p1, p2, K, method="8point")
        r1, r2, t = epipolar.decompose_essential_mat(e)
        tu = T / np.linalg.norm(T)
        assert min(np.abs(r1 - R).max(), np.abs(r2 - R).max()) < 1e-9
        assert min(np.abs(t - tu).max(), np.abs(t + tu).max()) < 1e-9
        # both are rotations
        for r in (r1, r2):
            assert np.abs(r @ r.T - np.eye(3)).max() < 1e-12
            assert np.linalg.det(r) > 0

    def test_essential_epipolar_constraint_normalized(self):
        K, R, T, _, p1, p2 = _rig()
        e, _ = epipolar.find_essential_mat(p1, p2, K, method="8point")
        x1 = (p1 - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
        x2 = (p2 - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
        h1 = np.column_stack([x1, np.ones(len(x1))])
        h2 = np.column_stack([x2, np.ones(len(x2))])
        assert np.abs(np.sum(h2 * (h1 @ e.T), axis=1)).max() < 1e-9


class TestCorrectMatches:
    def test_residual_zero_and_points_near_fixed(self):
        K, R, T, _, p1, p2 = _rig()
        f = _true_f(K, R, T)
        rng = np.random.default_rng(4)
        n1 = p1 + rng.normal(0, 0.5, p1.shape)
        n2 = p2 + rng.normal(0, 0.5, p2.shape)
        c1, c2 = epipolar.correct_matches(f, n1, n2)
        h1 = np.column_stack([c1, np.ones(len(c1))])
        h2 = np.column_stack([c2, np.ones(len(c2))])
        res = np.abs(np.sum(h2 * (h1 @ f.T), axis=1))
        assert res.max() < 1e-10  # exactly on the epipolar constraint
        move = (np.linalg.norm(c1 - n1, axis=1)
                + np.linalg.norm(c2 - n2, axis=1))
        assert move.max() < 3.0  # minimal correction, not a jump

    def test_exact_points_are_fixed_points(self):
        K, R, T, _, p1, p2 = _rig(seed=11)
        f = _true_f(K, R, T)
        c1, c2 = epipolar.correct_matches(f, p1, p2)
        assert np.abs(c1 - p1).max() < 1e-9
        assert np.abs(c2 - p2).max() < 1e-9

    def test_correction_reduces_error_vs_truth(self):
        K, R, T, _, p1, p2 = _rig(seed=6)
        f = _true_f(K, R, T)
        rng = np.random.default_rng(8)
        n1 = p1 + rng.normal(0, 0.7, p1.shape)
        n2 = p2 + rng.normal(0, 0.7, p2.shape)
        c1, c2 = epipolar.correct_matches(f, n1, n2)
        before = (np.linalg.norm(n1 - p1, axis=1)
                  + np.linalg.norm(n2 - p2, axis=1)).mean()
        after = (np.linalg.norm(c1 - p1, axis=1)
                 + np.linalg.norm(c2 - p2, axis=1)).mean()
        assert after < before

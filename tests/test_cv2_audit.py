"""Differential audit of cv2-facade names that previously had no test
coverage (round-4 session 4). Every case runs the same call against the
installed OpenCV 5.0 and our facade; tolerance 0 unless the divergence
is documented in the case.

Batch A: signature fixes + calib/core semantics (warpPolar incl. the
f32 fastAtan2 inverse maps, calcBackProject, buildOpticalFlowPyramid,
floodFill full semantics, getOptimalNewCameraMatrix exact K,
decomposeEssentialMat/recoverPose cv2 conventions, undistortPoints_cv,
PCA dtypes, triangulatePoints 4xN, misc array ops)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rustcv_tpu import cv2 as mycv2  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


def _img(rng, h=64, w=80, c=3):
    return rng.integers(0, 256, (h, w, c) if c else (h, w), np.uint8)


class TestWarpPolar:
    @pytest.mark.parametrize("flags", [
        cv2.INTER_LINEAR, cv2.INTER_NEAREST,
        cv2.INTER_LINEAR | cv2.WARP_POLAR_LOG])
    def test_forward_exact(self, rng, flags):
        img = _img(rng)
        a = cv2.warpPolar(img, (60, 50), (40.0, 32.0), 30.0, flags)
        b = mycv2.warpPolar(img, (60, 50), (40.0, 32.0), 30.0, flags)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("log", [False, True])
    def test_inverse_exact_in_range(self, rng, log):
        # outside the polar source range cv2 leaves dst UNINITIALIZED
        # (transparent remap); we emit 0 — compare the defined region
        pol = _img(rng, 50, 60)
        fl = cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP
        if log:
            fl |= cv2.WARP_POLAR_LOG
        a = cv2.warpPolar(pol, (80, 64), (40.0, 32.0), 30.0, fl)
        b = mycv2.warpPolar(pol, (80, 64), (40.0, 32.0), 30.0, fl)
        ys, xs = np.mgrid[0:64, 0:80]
        mag = np.hypot(xs - 40.0, ys - 32.0)
        rho = (np.log1p(mag) * (60 / np.log(30.0))) if log \
            else mag * (60 / 30.0)
        m = (rho < 58.5) & (mag > 0.5)
        if log:
            # cv2's hal log32f polynomial vs libm log1p: ≤1 ulp in the
            # f32 map → ≤1 LSB on <0.1% of pixels (documented)
            d = np.abs(a[m].astype(int) - b[m].astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-3
        else:
            np.testing.assert_array_equal(a[m], b[m])


class TestHistograms:
    def test_calc_back_project_1ch(self, rng):
        img = _img(rng)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hist = cv2.calcHist([hsv], [0], None, [30], [0, 180])
        a = cv2.calcBackProject([hsv], [0], hist, [0, 180], 1)
        b = mycv2.calcBackProject([hsv], [0], hist, [0, 180], 1)
        np.testing.assert_array_equal(a, b)

    def test_calc_back_project_2ch_scaled(self, rng):
        img = _img(rng)
        hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
        hist = cv2.calcHist([hsv], [0, 1], None, [30, 32],
                            [0, 180, 0, 256])
        a = cv2.calcBackProject([hsv], [0, 1], hist, [0, 180, 0, 256], 0.7)
        b = mycv2.calcBackProject([hsv], [0, 1], hist,
                                  [0, 180, 0, 256], 0.7)
        np.testing.assert_array_equal(a, b)


class TestOpticalFlowPyramid:
    @pytest.mark.parametrize("win,maxl", [((21, 21), 3), ((15, 15), 4)])
    def test_with_derivatives(self, rng, win, maxl):
        g = _img(rng, 48, 64, 0)
        ra, pa = cv2.buildOpticalFlowPyramid(g, win, maxl)
        rb, pb = mycv2.buildOpticalFlowPyramid(g, win, maxl)
        assert ra == rb and len(pa) == len(pb)
        for x, y in zip(pa, pb):
            np.testing.assert_array_equal(x, y)

    def test_without_derivatives(self, rng):
        g = _img(rng, 48, 64, 0)
        ra, pa = cv2.buildOpticalFlowPyramid(g, (15, 15), 4, None, False)
        rb, pb = mycv2.buildOpticalFlowPyramid(g, (15, 15), 4, None, False)
        assert ra == rb
        for x, y in zip(pa, pb):
            np.testing.assert_array_equal(x, y)


class TestFloodFill:
    def _grad(self):
        return (np.mgrid[0:64, 0:80][0] * 2
                + np.mgrid[0:64, 0:80][1]).astype(np.uint8)

    @pytest.mark.parametrize("fl", [4, 8, 4 | (1 << 16)])
    def test_gray(self, fl):
        g = self._grad()
        ia, ib = g.copy(), g.copy()
        ra = cv2.floodFill(ia, None, (10, 10), 200, 3, 3, fl)
        rb = mycv2.floodFill(ib, None, (10, 10), 200, 3, 3, fl)
        assert ra[0] == rb[0] and ra[3] == rb[3]
        np.testing.assert_array_equal(ia, ib)

    def test_color_fixed_range(self, rng):
        img = _img(rng, 32, 40)
        img[5:20, 5:30] = (100, 100, 100)
        ia, ib = img.copy(), img.copy()
        fl = 4 | (1 << 16)
        ra = cv2.floodFill(ia, None, (10, 10), (1, 2, 3),
                           (30, 30, 30), (30, 30, 30), fl)
        rb = mycv2.floodFill(ib, None, (10, 10), (1, 2, 3),
                             (30, 30, 30), (30, 30, 30), fl)
        assert ra[0] == rb[0] and ra[3] == rb[3]
        np.testing.assert_array_equal(ia, ib)

    def test_mask_and_new_mask_val(self):
        g = self._grad()
        ma = np.zeros((66, 82), np.uint8)
        mb = ma.copy()
        ma[5:10, 5:40] = 7
        mb[5:10, 5:40] = 7
        ia, ib = g.copy(), g.copy()
        ra = cv2.floodFill(ia, ma, (10, 20), 200, 3, 3, 4 | (55 << 8))
        rb = mycv2.floodFill(ib, mb, (10, 20), 200, 3, 3, 4 | (55 << 8))
        assert ra[0] == rb[0]
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)

    def test_mask_only(self):
        g = self._grad()
        ma = np.zeros((66, 82), np.uint8)
        mb = ma.copy()
        ia, ib = g.copy(), g.copy()
        cv2.floodFill(ia, ma, (10, 20), 200, 3, 3, 4 | (1 << 17))
        mycv2.floodFill(ib, mb, (10, 20), 200, 3, 3, 4 | (1 << 17))
        np.testing.assert_array_equal(ia, g)
        np.testing.assert_array_equal(ib, g)
        np.testing.assert_array_equal(ma, mb)


class TestCalib:
    def _cam(self, rng):
        K = np.array([[80 + rng.random() * 80, 0, 30 + rng.random() * 30],
                      [0, 80 + rng.random() * 80, 20 + rng.random() * 30],
                      [0, 0, 1.0]])
        d = (rng.random(5) - 0.5) * np.array([0.4, 0.2, 0.01, 0.01, 0.1])
        return K, d

    def test_get_optimal_new_camera_matrix_exact_K(self, rng):
        for _ in range(10):
            K, d = self._cam(rng)
            alpha = float(rng.random())
            cpp = bool(rng.integers(0, 2))
            Ka, roia = cv2.getOptimalNewCameraMatrix(
                K, d, (80, 64), alpha, centerPrincipalPoint=cpp)
            Kb, roib = mycv2.getOptimalNewCameraMatrix(
                K, d, (80, 64), alpha, centerPrincipalPoint=cpp)
            np.testing.assert_allclose(Ka, Kb, rtol=0, atol=1e-9)
            # roi: cv2 5 refines the inscribed rectangle beyond border
            # extrema; ours is the classic border-extrema rect (±1 px)
            assert all(abs(x - y) <= 1 for x, y in zip(roia, roib))

    def test_undistort_points_cv_exact(self, rng):
        from rustcv_tpu.ops.calib import undistort_points_cv
        K, d = self._cam(rng)
        pts = rng.random((20, 2)) * np.array([80, 64])
        want = cv2.undistortPoints(
            pts.reshape(-1, 1, 2), K, d).reshape(-1, 2)
        got = undistort_points_cv(pts, K, d)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_init_undistort_rectify_map_with_R(self, rng):
        K, d = self._cam(rng)
        R = cv2.Rodrigues(np.array([0.01, -0.02, 0.005]))[0]
        ma1, ma2 = cv2.initUndistortRectifyMap(K, d, R, K, (80, 64),
                                               cv2.CV_32FC1)
        mb1, mb2 = mycv2.initUndistortRectifyMap(K, d, R, K, (80, 64),
                                                 cv2.CV_32FC1)
        np.testing.assert_allclose(ma1, mb1, atol=2e-4)
        np.testing.assert_allclose(ma2, mb2, atol=2e-4)

    def test_decompose_essential_mat(self):
        t = np.array([1.0, 0.2, -0.1])
        t /= np.linalg.norm(t)
        th = 0.2
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        E = tx @ R
        for a, b in zip(cv2.decomposeEssentialMat(E),
                        mycv2.decomposeEssentialMat(E)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-12)

    def test_recover_pose(self, rng):
        pts3 = rng.random((30, 3)) + [0, 0, 3]
        Rm = cv2.Rodrigues(np.array([0.1, -0.05, 0.02]))[0]
        tv = np.array([0.5, 0.1, 0.05])
        x1 = (pts3[:, :2] / pts3[:, 2:]).astype(np.float32)
        p2 = pts3 @ Rm.T + tv
        x2 = (p2[:, :2] / p2[:, 2:]).astype(np.float32)
        E, _ = cv2.findEssentialMat(x1, x2, np.eye(3), cv2.RANSAC,
                                    0.999, 1e-3)
        na, Ra, ta, mka = cv2.recoverPose(E, x1, x2, np.eye(3))
        nb, Rb, tb, mkb = mycv2.recoverPose(E, x1, x2, np.eye(3))
        assert na == nb
        np.testing.assert_allclose(Ra, Rb, atol=1e-9)
        np.testing.assert_allclose(ta, tb, atol=1e-9)
        np.testing.assert_array_equal(mka.ravel() > 0, mkb.ravel() > 0)

    def test_triangulate_points(self, rng):
        P1 = np.hstack([np.eye(3), np.zeros((3, 1))])
        P2 = np.hstack([np.eye(3), np.array([[1.0], [0], [0]])])
        X = rng.random((4, 6))
        X[3] = 1
        X[2] += 3
        x1 = P1 @ X
        x1 = (x1[:2] / x1[2]).astype(np.float32)
        x2 = P2 @ X
        x2 = (x2[:2] / x2[2]).astype(np.float32)
        oa = cv2.triangulatePoints(P1, P2, x1, x2)
        ob = mycv2.triangulatePoints(P1, P2, x1, x2)
        assert oa.shape == ob.shape and oa.dtype == ob.dtype
        np.testing.assert_allclose(oa[:3] / oa[3], ob[:3] / ob[3],
                                   atol=1e-4)

    def test_compute_correspond_epilines(self, rng):
        F = rng.random((3, 3))
        F /= F[2, 2]
        p = (rng.random((5, 2)) * 50).astype(np.float32)
        la = cv2.computeCorrespondEpilines(p.reshape(-1, 1, 2), 1, F)
        lb = mycv2.computeCorrespondEpilines(p.reshape(-1, 1, 2), 1, F)
        np.testing.assert_allclose(la, lb, atol=1e-6)

    def test_corner_sub_pix_close(self):
        im = np.zeros((64, 64), np.uint8)
        im[:32, :32] = 255
        im[32:, 32:] = 255
        crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER,
                30, 0.01)
        c0 = np.array([[[31.3, 31.6]]], np.float32)
        a = cv2.cornerSubPix(im, c0.copy(), (5, 5), (-1, -1), crit)
        b = mycv2.cornerSubPix(im, c0.copy(), (5, 5), (-1, -1), crit)
        np.testing.assert_allclose(a, b, atol=5e-3)


class TestCoreArray:
    def test_set_identity(self):
        a1 = np.full((4, 5), 9, np.float32)
        a2 = a1.copy()
        cv2.setIdentity(a1, 3)
        mycv2.setIdentity(a2, 3)
        np.testing.assert_array_equal(a1, a2)

    def test_complete_symm(self, rng):
        m0 = rng.random((4, 4)).astype(np.float32)
        for flag in (False, True):
            a, b = m0.copy(), m0.copy()
            cv2.completeSymm(a, flag)
            mycv2.completeSymm(b, flag)
            np.testing.assert_array_equal(a, b)

    def test_sv_back_subst(self, rng):
        A = rng.random((5, 5))
        rhs = rng.random((5, 1))
        w, u, vt = cv2.SVDecomp(A)
        a = cv2.SVBackSubst(w, u, vt, rhs)
        b = mycv2.SVBackSubst(w, u, vt, rhs)
        np.testing.assert_allclose(a, b, atol=1e-12)

    def test_pca_project_back_project(self, rng):
        data = rng.random((20, 6)).astype(np.float32)
        mean, eig = cv2.PCACompute(data, None, maxComponents=3)
        pa = cv2.PCAProject(data, mean, eig)
        pb = mycv2.PCAProject(data, mean, eig)
        assert pa.dtype == pb.dtype
        np.testing.assert_allclose(pa, pb, atol=1e-5)
        ba = cv2.PCABackProject(pa, mean, eig)
        bb = mycv2.PCABackProject(pb, mean, eig)
        assert ba.dtype == bb.dtype
        np.testing.assert_allclose(ba, bb, atol=1e-5)

    def test_scale_add_pow_patch_nans(self, rng):
        f = rng.random((16, 20)).astype(np.float32)
        np.testing.assert_allclose(cv2.scaleAdd(f, 2.5, f[::-1].copy()),
                                   mycv2.scaleAdd(f, 2.5, f[::-1].copy()),
                                   atol=1e-6)
        np.testing.assert_allclose(cv2.pow(f, 2.0), mycv2.pow(f, 2.0),
                                   atol=1e-6)
        g = f.copy()
        g[0, 0] = np.nan
        a, b = g.copy(), g.copy()
        cv2.patchNaNs(a, 7.0)
        mycv2.patchNaNs(b, 7.0)
        np.testing.assert_array_equal(a, b)

    def test_transpose_flip_nd(self, rng):
        # cv2's ndarray mapping treats a trailing dim ≤4 as channels;
        # use a channel-free 3-D shape for the true N-D comparison
        a = np.ascontiguousarray(
            rng.random((3, 4, 5, 1)).astype(np.float32)[..., 0])
        at = cv2.transposeND(a.reshape(3, 4, 5, 1), [2, 0, 1, 3])
        bt = mycv2.transposeND(a, [2, 0, 1])
        np.testing.assert_array_equal(np.asarray(at).reshape(5, 3, 4), bt)
        g2 = rng.random((6, 7)).astype(np.float32)
        for ax in (0, 1):
            np.testing.assert_array_equal(cv2.flipND(g2, ax),
                                          mycv2.flipND(g2, ax))

    def test_insert_channel(self, rng):
        img = _img(rng, 16, 20)
        plane = _img(rng, 16, 20, 0)
        a, b = img.copy(), img.copy()
        cv2.insertChannel(plane, a, 1)
        mycv2.insertChannel(plane, b, 1)
        np.testing.assert_array_equal(a, b)

    def test_rand_shuffle_permutes(self):
        arr = np.arange(20, dtype=np.float32)
        mycv2.randShuffle(arr)
        assert sorted(arr.tolist()) == list(map(float, range(20)))


class TestShapes:
    def test_convexity_defects(self):
        pts = np.array([[0, 0], [50, 5], [60, 40], [55, 60], [30, 20],
                        [5, 45], [2, 30]], np.int32).reshape(-1, 1, 2)
        hull = cv2.convexHull(pts, returnPoints=False)
        a = cv2.convexityDefects(pts, hull)
        b = mycv2.convexityDefects(pts, hull)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)

    def test_intersect_convex_convex(self):
        p1 = np.array([[0, 0], [40, 0], [40, 40], [0, 40]], np.float32)
        p2 = np.array([[20, 20], [60, 20], [60, 60], [20, 60]],
                      np.float32)
        aa, pa = cv2.intersectConvexConvex(p1, p2)
        ab, pb = mycv2.intersectConvexConvex(p1, p2)
        assert aa == ab
        assert set(map(tuple, np.asarray(pa).reshape(-1, 2).tolist())) \
            == set(map(tuple, np.asarray(pb).reshape(-1, 2).tolist()))


class TestPhoto:
    def test_edge_preserving_filter_recursive_exact(self, rng):
        img = _img(rng, 48, 60)
        a = cv2.edgePreservingFilter(img, None, 1, 60, 0.4)
        b = mycv2.edgePreservingFilter(img, None, 1, 60, 0.4)
        np.testing.assert_array_equal(a, b)

    def test_grab_cut_rect_agrees(self, rng):
        img = _img(rng)
        mask = np.zeros(img.shape[:2], np.uint8)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        ra = cv2.grabCut(img.copy(), mask.copy(), (10, 10, 40, 30),
                         bgd.copy(), fgd.copy(), 2,
                         cv2.GC_INIT_WITH_RECT)
        rb = mycv2.grabCut(img.copy(), mask.copy(), (10, 10, 40, 30),
                           bgd.copy(), fgd.copy(), 2,
                           cv2.GC_INIT_WITH_RECT)
        # GMM-based labels: demand near-total agreement, not bit equality
        agree = (np.asarray(ra[0]) == np.asarray(rb[0])).mean()
        assert agree > 0.97

"""Cross-validate rustcv_tpu.cv2._calib3d against real OpenCV 5.0."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")

K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])


def _pose_views(rng, n_views=3, n_pts=24, size=(640, 480)):
    obj = []
    img = []
    w, h = size
    for v in range(n_views):
        pts = np.zeros((n_pts, 3))
        pts[:, 0] = (np.arange(n_pts) % 6) * 0.1
        pts[:, 1] = (np.arange(n_pts) // 6) * 0.1
        rvec = rng.randn(3) * 0.2
        tvec = np.r_[rng.randn(2) * 0.1, 2.0 + v * 0.2]
        p, _ = cv2.projectPoints(pts, rvec, tvec, K, None)
        obj.append(pts.astype(np.float32))
        img.append(p.astype(np.float32))
    return obj, img


def test_compose_rt():
    rng = np.random.RandomState(0)
    rv1, tv1 = rng.rand(3) * 0.4, rng.rand(3)
    rv2, tv2 = rng.rand(3) * 0.4, rng.rand(3)
    ours = R.composeRT(rv1, tv1, rv2, tv2)
    want = cv2.composeRT(rv1, tv1, rv2, tv2)
    assert len(ours) == len(want) == 10
    for o, w in zip(ours, want):
        np.testing.assert_allclose(o, w, atol=1e-5)


def test_mat_mul_deriv():
    rng = np.random.RandomState(1)
    A, B = rng.rand(2, 3), rng.rand(3, 4)
    gA, gB = R.matMulDeriv(A, B)
    wA, wB = cv2.matMulDeriv(A, B)
    np.testing.assert_allclose(gA, wA, atol=1e-12)
    np.testing.assert_allclose(gB, wB, atol=1e-12)


def test_rq_decomp():
    rng = np.random.RandomState(2)
    for _ in range(10):
        M = rng.randn(3, 3)
        ge, gR, gQ, gx, gy, gz = R.RQDecomp3x3(M)
        we, wR, wQ, wx, wy, wz = cv2.RQDecomp3x3(M)
        np.testing.assert_allclose(ge, we, atol=1e-8)
        np.testing.assert_allclose(gR, wR, atol=1e-10)
        np.testing.assert_allclose(gQ, wQ, atol=1e-10)
        np.testing.assert_allclose(gx, wx, atol=1e-10)
        np.testing.assert_allclose(gy, wy, atol=1e-10)
        np.testing.assert_allclose(gz, wz, atol=1e-10)


def test_decompose_projection_matrix():
    rng = np.random.RandomState(3)
    for _ in range(5):
        P = rng.randn(3, 4)
        g = R.decomposeProjectionMatrix(P)
        w = cv2.decomposeProjectionMatrix(P)
        np.testing.assert_allclose(g[0], w[0], atol=1e-8)  # K
        np.testing.assert_allclose(g[1], w[1], atol=1e-8)  # R
        gt, wt = g[2].ravel(), w[2].ravel()
        if np.sign(gt[np.abs(gt).argmax()]) != np.sign(wt[np.abs(wt).argmax()]):
            gt = -gt
        np.testing.assert_allclose(gt, wt, atol=1e-8)      # t up to sign
        np.testing.assert_allclose(g[6].ravel(), w[6].ravel(), atol=1e-6)


def test_calibration_matrix_values():
    g = R.calibrationMatrixValues(K, (640, 480), 6.4, 4.8)
    w = cv2.calibrationMatrixValues(K, (640, 480), 6.4, 4.8)
    np.testing.assert_allclose(g[0], w[0], rtol=1e-9)
    np.testing.assert_allclose(g[1], w[1], rtol=1e-9)
    np.testing.assert_allclose(g[2], w[2], rtol=1e-9)
    np.testing.assert_allclose(g[3], w[3], rtol=1e-9)
    np.testing.assert_allclose(g[4], w[4], rtol=1e-9)


def test_sampson_distance():
    rng = np.random.RandomState(4)
    F = rng.rand(3, 3)
    p1 = np.r_[rng.rand(2), 1.0]
    p2 = np.r_[rng.rand(2), 1.0]
    assert R.sampsonDistance(p1, p2, F) == pytest.approx(
        cv2.sampsonDistance(p1.reshape(3, 1), p2.reshape(3, 1), F))


def test_correct_matches():
    rng = np.random.RandomState(5)
    p1 = rng.rand(8, 2) * 100
    p2 = p1 + rng.randn(8, 2)
    F, _ = cv2.findFundamentalMat(
        np.vstack([p1, rng.rand(4, 2) * 100]).astype(np.float64),
        np.vstack([p2, rng.rand(4, 2) * 100]).astype(np.float64),
        cv2.FM_8POINT)
    g1, g2 = R.correctMatches(F, p1[None], p2[None])
    w1, w2 = cv2.correctMatches(F, p1[None], p2[None])
    np.testing.assert_allclose(g1, w1, atol=1e-4)
    np.testing.assert_allclose(g2, w2, atol=1e-4)


def test_solve_cubic_poly():
    n, r = R.solveCubic(np.array([1.0, -6, 11, -6]))
    wn, wr = cv2.solveCubic(np.array([1.0, -6, 11, -6]))
    assert n == wn
    np.testing.assert_allclose(np.sort(r.ravel()), np.sort(wr.ravel()),
                               atol=1e-9)
    n, r = R.solveCubic(np.array([0.0, 1, -3, 2]))
    wn, wr = cv2.solveCubic(np.array([0.0, 1, -3, 2]))
    assert n == wn
    np.testing.assert_allclose(np.sort(r.ravel()), np.sort(wr.ravel()),
                               atol=1e-9)
    _, gr = R.solvePoly(np.array([-6.0, 11, -6, 1]))
    _, wr = cv2.solvePoly(np.array([-6.0, 11, -6, 1]))
    gs = np.sort(gr.reshape(-1, 2)[:, 0])
    ws = np.sort(wr.reshape(-1, 2)[:, 0])
    np.testing.assert_allclose(gs, ws, atol=1e-6)


def test_estimate_affine_translation_3d():
    rng = np.random.RandomState(6)
    src = rng.rand(20, 3)
    Rm, _ = cv2.Rodrigues(np.r_[0.1, 0.2, -0.15])
    dst = src @ Rm.T + [1, 2, 3]
    ret, A, inl = R.estimateAffine3D(src, dst)
    assert ret and inl.sum() == 20
    np.testing.assert_allclose(A[:, :3], Rm, atol=1e-6)
    np.testing.assert_allclose(A[:, 3], [1, 2, 3], atol=1e-6)
    t2, inl2 = R.estimateTranslation2D(src[:, :2], src[:, :2] + [3, 4])
    np.testing.assert_allclose(t2.ravel(), [3, 4], atol=1e-9)
    ret3, t3, inl3 = R.estimateTranslation3D(src, src + [1, -2, 0.5])
    np.testing.assert_allclose(t3.ravel(), [1, -2, 0.5], atol=1e-9)


def test_solve_p3p_and_generic():
    rng = np.random.RandomState(7)
    obj = rng.rand(3, 3) * 2
    obj[:, 2] += 4
    rv0, tv0 = np.r_[0.1, -0.2, 0.15], np.r_[0.3, -0.1, 6.0]
    img, _ = cv2.projectPoints(obj, rv0, tv0, K, None)
    n, rvs, tvs = R.solveP3P(obj, img, K, None, cv2.SOLVEPNP_P3P)
    assert n >= 1
    best = min(np.linalg.norm(np.asarray(r).ravel() - rv0) for r in rvs)
    assert best < 1e-4
    obj6 = rng.rand(6, 3) * 2
    obj6[:, 2] += 4
    img6, _ = cv2.projectPoints(obj6, rv0, tv0, K, None)
    n, rvs, tvs, errs = R.solvePnPGeneric(obj6, img6, K, None)
    assert n == 1
    np.testing.assert_allclose(rvs[0].ravel(), rv0, atol=1e-5)
    assert errs.ravel()[0] < 1e-5


def test_solve_pnp_refine():
    rng = np.random.RandomState(8)
    obj = rng.rand(10, 3) * 2
    obj[:, 2] += 4
    rv0, tv0 = np.r_[0.1, -0.2, 0.15], np.r_[0.3, -0.1, 6.0]
    img, _ = cv2.projectPoints(obj, rv0, tv0, K, None)
    rv, tv = R.solvePnPRefineLM(obj, img, K, None, rv0 + 0.02, tv0 + 0.05)
    np.testing.assert_allclose(rv.ravel(), rv0, atol=1e-6)
    np.testing.assert_allclose(tv.ravel(), tv0, atol=1e-5)


def test_undistort_image_points():
    rng = np.random.RandomState(9)
    dist = np.array([0.05, -0.02, 0.001, 0.001, 0.0])
    p = (rng.rand(6, 1, 2) * [200, 150] + [220, 160])
    g = R.undistortImagePoints(p, K, dist)
    w = cv2.undistortImagePoints(p, K, dist)
    np.testing.assert_allclose(g, w, atol=1e-3)


def test_reproject_image_to_3d():
    rng = np.random.RandomState(10)
    disp = (rng.rand(6, 8) * 16 + 1).astype(np.float32)
    Q = np.array([[1, 0, 0, -4], [0, 1, 0, -3],
                  [0, 0, 0, 500], [0, 0, 10, 0]], np.float64)
    g = R.reprojectImageTo3D(disp, Q)
    w = cv2.reprojectImageTo3D(disp, Q)
    np.testing.assert_allclose(g, w, rtol=1e-5)


def test_filter_speckles():
    d = np.zeros((8, 10), np.int16)
    d[2, 3] = 160
    d[0:2, 0:2] = 80
    d[5:8, 5:9] = 160
    g = d.copy()
    w = d.copy()
    R.filterSpeckles(g, 0, 3, 16)
    cv2.filterSpeckles(w, 0, 3, 16)
    np.testing.assert_array_equal(g, w)


def test_get_valid_disparity_roi():
    g = R.getValidDisparityROI((10, 10, 600, 400), (5, 8, 600, 400),
                               16, 64, 21)
    w = cv2.getValidDisparityROI((10, 10, 600, 400), (5, 8, 600, 400),
                                 16, 64, 21)
    assert tuple(g) == tuple(w)
    assert R.getValidDisparityROI((0, 0, 64, 48), (0, 0, 64, 48),
                                  16, 64, 9) == (0, 0, 0, 0)


def test_validate_disparity():
    rng = np.random.RandomState(11)
    disp = (rng.randint(0, 8, (12, 40)) * 16).astype(np.int16)
    cost = rng.randint(0, 100, (12, 40)).astype(np.int16)
    g = disp.copy()
    w = disp.copy()
    R.validateDisparity(g, cost, 0, 8, 1)
    cv2.validateDisparity(w, cost, 0, 8, 1)
    np.testing.assert_array_equal(g, w)


def test_ecc():
    rng = np.random.RandomState(12)
    im = cv2.GaussianBlur((rng.rand(40, 50) * 255).astype(np.float32),
                          (7, 7), 2.0)
    warp = np.array([[1, 0, 2.0], [0, 1, -1.0]], np.float32)
    im2 = cv2.warpAffine(im, warp, (50, 40))
    assert R.computeECC(im, im) == pytest.approx(1.0, abs=1e-6)
    cc, W = R.findTransformECC(im, im2, np.eye(2, 3, dtype=np.float32),
                               cv2.MOTION_TRANSLATION)
    # ours converges to the true translation; cv2's looser default
    # criteria (eps 1e-3, internal 5x5 blur) stops ~0.7 px off here
    np.testing.assert_allclose(W[:, 2], [2.0, -1.0], atol=0.15)


def test_pca_compute2():
    rng = np.random.RandomState(13)
    data = rng.rand(30, 5)
    gm, gv, gl = R.PCACompute2(data, None)
    wm, wv, wl = cv2.PCACompute2(data, None)
    np.testing.assert_allclose(gm, wm, atol=1e-10)
    np.testing.assert_allclose(gl, wl, atol=1e-10)
    for i in range(5):  # eigenvector sign ambiguity
        a, b = gv[i], wv[i]
        if np.dot(a, b) < 0:
            a = -a
        np.testing.assert_allclose(a, b, atol=1e-8)
    gm, gv, gl = R.PCACompute2(data, None, maxComponents=2)
    wm, wv, wl = cv2.PCACompute2(data, None, maxComponents=2)
    assert gv.shape == wv.shape and gl.shape == wl.shape


def test_threshold_with_mask():
    rng = np.random.RandomState(14)
    a = (rng.rand(6, 8) * 255).astype(np.uint8)
    m = (rng.rand(6, 8) > 0.5).astype(np.uint8)
    gd = np.full_like(a, 7)
    wd = np.full_like(a, 7)
    gr, gout = R.thresholdWithMask(a, gd, m, 128, 255, cv2.THRESH_BINARY)
    wr, wout = cv2.thresholdWithMask(a, wd, m, 128, 255, cv2.THRESH_BINARY)
    assert gr == wr
    np.testing.assert_array_equal(gout, wout)


def test_gftt_with_quality():
    rng = np.random.RandomState(15)
    img = np.zeros((64, 64), np.uint8)
    for _ in range(8):
        x, y = rng.randint(8, 56, 2)
        img[y:y + 6, x:x + 6] = rng.randint(100, 255)
    pts, q = R.goodFeaturesToTrackWithQuality(img, 10, 0.01, 5, None)
    assert pts is not None and len(q) == len(pts)
    assert (np.diff(q) <= 1e-6).all()  # sorted strongest-first


def test_nlmeans_multi():
    rng = np.random.RandomState(16)
    seq = [(rng.rand(16, 16) * 255).astype(np.uint8) for _ in range(3)]
    g = R.fastNlMeansDenoisingMulti(seq, 1, 3, None, 4, 7, 9)
    w = cv2.fastNlMeansDenoisingMulti(seq, 1, 3, None, 4, 7, 9)
    # cv2 uses quantized exp LUT; envelope documented in ops/nlmeans.py
    assert np.abs(g.astype(int) - w.astype(int)).mean() < 6


def test_flow_io(tmp_path):
    rng = np.random.RandomState(17)
    flow = rng.randn(10, 12, 2).astype(np.float32)
    p = str(tmp_path / "f.flo")
    assert R.writeOpticalFlow(p, flow)
    back = cv2.readOpticalFlow(p)
    np.testing.assert_array_equal(back, flow)
    p2 = str(tmp_path / "g.flo")
    cv2.writeOpticalFlow(p2, flow)
    np.testing.assert_array_equal(R.readOpticalFlow(p2), flow)


def test_find_circles_grid():
    img = np.full((220, 280), 255, np.uint8)
    want = []
    for r in range(3):
        for c in range(4):
            cv2.circle(img, (60 + c * 50, 60 + r * 50), 9, 0, -1)
            want.append((60 + c * 50, 60 + r * 50))
    ok, centers = R.findCirclesGrid(img, (4, 3),
                                    flags=cv2.CALIB_CB_SYMMETRIC_GRID)
    assert ok
    got = centers.reshape(-1, 2)
    want = np.asarray(want, np.float64)
    d = np.abs(got[:, None, :] - want[None, :, :]).sum(-1).min(1)
    assert d.max() < 1.0


def test_stereo_calibrate_facade():
    rng = np.random.RandomState(18)
    obj, img1 = _pose_views(rng)
    Rr, _ = cv2.Rodrigues(np.r_[0.02, 0.03, 0.01])
    T = np.r_[-0.2, 0.01, 0.02]
    img2 = []
    for o, rvtv in zip(obj, range(len(obj))):
        # reproject through the second camera
        pass
    # build img2 by composing poses explicitly
    img2 = []
    for v, o in enumerate(obj):
        rvec = np.r_[0.0, 0.0, 0.0]
        tvec = np.r_[0.0, 0.0, 2.0 + v * 0.2]
        # world->cam1 identity-ish poses used in _pose_views aren't
        # recoverable; just re-project with fresh known poses:
    obj2, i1 = _pose_views(rng, n_views=3)
    i2 = []
    for v in range(3):
        pts = obj2[v].astype(np.float64)
        # cam1 pose
        rv = np.zeros(3)
        tv = np.r_[0.0, 0.0, 2.0]
        R1, _ = cv2.Rodrigues(rv)
        pc = pts @ R1.T + tv
        p1, _ = cv2.projectPoints(pts, rv, tv, K, None)
        i1[v] = p1.astype(np.float32)
        pc2 = pc @ Rr.T + T
        p2 = (pc2 / pc2[:, 2:]) @ K.T
        i2.append(p2[:, :2].reshape(-1, 1, 2).astype(np.float32))
    out = R.stereoCalibrate(obj2, i1, i2, K, None, K, None, (640, 480))
    rms, _, _, _, _, Rg, Tg = out[:7]
    assert rms < 0.5
    np.testing.assert_allclose(Rg, Rr, atol=1e-3)
    np.testing.assert_allclose(Tg.ravel(), T, atol=1e-3)


def test_depth_to_3d():
    rng = np.random.RandomState(19)
    depth = (rng.rand(8, 10) * 3 + 0.5).astype(np.float32)
    pts = R.depthTo3d(depth, K)
    assert pts.shape == (8, 10, 3)
    # reproject back
    x = pts[..., 0] / pts[..., 2] * K[0, 0] + K[0, 2]
    y = pts[..., 1] / pts[..., 2] * K[1, 1] + K[1, 2]
    xx, yy = np.meshgrid(np.arange(10), np.arange(8))
    np.testing.assert_allclose(x, xx, atol=1e-4)
    np.testing.assert_allclose(y, yy, atol=1e-4)
    sp = R.depthTo3dSparse(depth, K, np.array([[2.0, 3.0], [5.0, 1.0]]))
    assert sp.shape == (2, 1, 3)


def test_mesh_pointcloud_io(tmp_path):
    rng = np.random.RandomState(20)
    v = rng.rand(9, 3).astype(np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    p = str(tmp_path / "m.ply")
    R.saveMesh(p, v, f)
    v2, f2 = R.loadMesh(p)
    np.testing.assert_allclose(v2.reshape(-1, 3), v, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(f2).reshape(-1, 3), f)
    pc = str(tmp_path / "c.ply")
    R.savePointCloud(pc, v)
    v3, _, _ = R.loadPointCloud(pc)
    np.testing.assert_allclose(v3.reshape(-1, 3), v, atol=1e-6)

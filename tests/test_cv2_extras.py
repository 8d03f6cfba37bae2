"""Cross-validate rustcv_tpu.cv2._extras against real OpenCV 5.0."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")


def test_solve_lp():
    c = np.array([[3.0], [1.0], [2.0]])
    A = np.array([[1.0, 1, 3, 30], [2, 2, 5, 24], [4, 1, 2, 36]])
    gr, gz = R.solveLP(c, A)
    wr, wz = cv2.solveLP(c, A, 1e-12)
    assert gr == wr == R.SOLVELP_SINGLE
    np.testing.assert_allclose(gz, wz, atol=1e-9)
    # unbounded: maximize x with no constraints that bound it
    gr, _ = R.solveLP(np.array([[1.0]]), np.array([[-1.0, 1.0]]))
    assert gr == R.SOLVELP_UNBOUNDED


def test_phase_correlate_iterative():
    rng = np.random.RandomState(1)
    a = cv2.GaussianBlur((rng.rand(64, 64) * 255).astype(np.float32),
                         (5, 5), 2)
    M = np.float32([[1, 0, 3.3], [0, 1, -1.7]])
    b = cv2.warpAffine(a, M, (64, 64))
    dx, dy = R.phaseCorrelateIterative(a, b)
    assert abs(dx - 3.3) < 0.15 and abs(dy + 1.7) < 0.15


def test_rectangle_intersection_area():
    for a, b in [((0, 0, 10, 10), (5, 5, 10, 10)),
                 ((0, 0, 4, 4), (10, 10, 2, 2)),
                 ((1, 1, 8, 6), (3, 2, 2, 10))]:
        assert R.rectangleIntersectionArea(a, b) == \
            cv2.rectangleIntersectionArea(a, b)


def test_min_enclosing_convex_polygon():
    rng = np.random.RandomState(2)
    pts = (rng.rand(30, 2) * 100).astype(np.float32)
    ga, gp = R.minEnclosingConvexPolygon(pts, 5)
    wa, wp = cv2.minEnclosingConvexPolygon(pts, 5)
    assert gp.shape[0] <= 6
    # all points inside our polygon (boundary points may fall a float32
    # rounding hair outside)
    for p in pts:
        assert cv2.pointPolygonTest(gp.reshape(-1, 1, 2), tuple(map(
            float, p)), True) >= -1e-3
    # greedy is within 10% of cv2's optimum
    assert ga <= wa * 1.10 + 1e-6
    hull_area = cv2.contourArea(cv2.convexHull(pts))
    assert ga >= hull_area - 1e-6


def test_get_closest_ellipse_points():
    ell = ((50.0, 40.0), (40.0, 20.0), 30.0)
    rng = np.random.RandomState(3)
    p = (rng.rand(8, 1, 2) * 100).astype(np.float32)
    g = R.getClosestEllipsePoints(ell, p)
    w = cv2.getClosestEllipsePoints(ell, p)
    np.testing.assert_allclose(g.reshape(-1, 2), np.asarray(w).reshape(
        -1, 2), atol=1e-2)


def test_cc_with_algorithm():
    img = np.zeros((16, 16), np.uint8)
    img[2:5, 2:5] = 255
    img[10:14, 8:12] = 255
    gn, gl = R.connectedComponentsWithAlgorithm(img, 8, cv2.CV_32S,
                                                cv2.CCL_DEFAULT)
    wn, wl = cv2.connectedComponentsWithAlgorithm(img, 8, cv2.CV_32S,
                                                  cv2.CCL_DEFAULT)
    assert gn == wn
    np.testing.assert_array_equal(gl > 0, wl > 0)
    g = R.connectedComponentsWithStatsWithAlgorithm(img, 8, cv2.CV_32S,
                                                    cv2.CCL_DEFAULT)
    w = cv2.connectedComponentsWithStatsWithAlgorithm(img, 8, cv2.CV_32S,
                                                      cv2.CCL_DEFAULT)
    assert g[0] == w[0]
    np.testing.assert_array_equal(np.sort(g[2][:, 4]), np.sort(w[2][:, 4]))


def test_multi_encode_decode():
    rng = np.random.RandomState(4)
    imgs = [rng.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(3)]
    ok, buf = R.imencodemulti(".tiff", imgs)
    assert ok
    ok2, back = R.imdecodemulti(buf)
    assert ok2 and len(back) == 3
    for a, b in zip(imgs, back):
        np.testing.assert_array_equal(a, b)
    # cv2 can decode our buffer
    wok, wback = cv2.imdecodemulti(buf, cv2.IMREAD_COLOR)
    assert wok and len(wback) == 3
    np.testing.assert_array_equal(wback[0], imgs[0])


def test_encode_with_metadata_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (8, 8, 3), np.uint8)
    ok, buf = R.imencodeWithMetadata(".png", img, None,
                                     {"author": "rustcv"})
    assert ok
    back, keys, vals = R.imdecodeWithMetadata(buf)
    np.testing.assert_array_equal(back, img)
    assert dict(zip(keys, vals)).get("author") == "rustcv"


def test_animation_roundtrip(tmp_path):
    rng = np.random.RandomState(6)
    anim = R.Animation()
    for i in range(3):
        f = np.zeros((16, 16, 3), np.uint8)
        f[:, :, i] = 200
        anim.frames.append(f)
        anim.durations.append(80)
    p = str(tmp_path / "a.gif")
    assert R.imwriteanimation(p, anim)
    ok, back = R.imreadanimation(p)
    assert ok and len(back.frames) == 3
    assert back.frames[0].shape == (16, 16, 3)
    assert back.durations[0] == 80
    # cv2 reads our file
    wok, wanim = cv2.imreadanimation(p)
    assert wok and len(wanim.frames) == 3
    ok, buf = R.imencodeanimation(".gif", anim)
    assert ok
    ok, dec = R.imdecodeanimation(buf)
    assert ok and len(dec.frames) == 3


def test_ann_index():
    rng = np.random.RandomState(7)
    data = rng.rand(50, 6).astype(np.float32)
    q = data[:4]
    for dist, wdist in [(R.ANNIndex_DIST_EUCLIDEAN,
                         cv2.ANNINDEX_DIST_EUCLIDEAN),
                        (R.ANNIndex_DIST_MANHATTAN,
                         cv2.ANNINDEX_DIST_MANHATTAN)]:
        g = R.ANNIndex_create(6, dist)
        g.addItems(data)
        g.build(4)
        gi, gd = g.knnSearch(q, 3)
        assert (gi[:, 0] == np.arange(4)).all()  # self is nearest
        np.testing.assert_allclose(gd[:, 0], 0, atol=1e-5)
        # exact: verify against brute force
        if dist == R.ANNIndex_DIST_EUCLIDEAN:
            bf = np.sqrt(((q[:, None] - data[None]) ** 2).sum(-1))
            np.testing.assert_array_equal(gi, bf.argsort(1)[:, :3])
    assert g.getItemNumber() == 50
    assert g.getTreeNumber() == 4


def test_rgbd_normals():
    # a tilted plane z = 1 + 0.1x
    K = np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]])
    pts = R.depthTo3d(np.fromfunction(
        lambda y, x: 1.0 + 0.002 * x, (48, 64)), K)
    n = R.RgbdNormals_create(K=K).apply(pts)
    assert n.shape == pts.shape
    inner = n[8:-8, 8:-8].reshape(-1, 3)
    # normals unit-length and consistent across the plane
    np.testing.assert_allclose(np.linalg.norm(inner, axis=1), 1.0,
                               atol=1e-3)
    mean = inner.mean(0)
    mean /= np.linalg.norm(mean)
    assert np.abs(inner @ mean).min() > 0.99


def test_triangle_rasterize_against_cv2():
    verts = np.array([[-0.5, -0.5, 3.0], [0.5, -0.5, 3.0],
                      [0.0, 0.6, 3.0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    cols = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 0.0
    # OpenGL camera looks down -z: push the triangle to z=-3 world
    verts_gl = verts.copy()
    verts_gl[:, 2] = -3.0
    fov = np.deg2rad(60.0)
    gc = np.zeros((48, 64, 3), np.float32)
    gd = np.full((48, 64), 100.0, np.float32)
    R.triangleRasterize(verts_gl, idx, cols, gc, gd, w2c, fov, 0.1, 100.0)
    wc = np.zeros((48, 64, 3), np.float32)
    wd = np.full((48, 64), 100.0, np.float32)
    cv2.triangleRasterize(verts_gl, idx, cols, wc, wd, w2c, fov, 0.1,
                          100.0)
    gmask = (gc.sum(-1) > 0)
    wmask = (wc.sum(-1) > 0)
    inter = (gmask & wmask).sum()
    union = (gmask | wmask).sum()
    assert union > 100 and inter / union > 0.9
    both = gmask & wmask
    assert np.abs(gc[both] - wc[both]).mean() < 0.12


def test_small_shims():
    p = R.UsacParams()
    assert p.confidence == 0.99
    tc = R.TermCriteria(3, 30, 0.001)
    assert tuple(tc) == (3, 30, 0.001)
    assert R.TrackerMIL_Params().featureSetNumFeatures == 250
    a = R.AsyncArray(5)
    assert a.valid() and a.get() == 5
    R.redirectError(None)
    w = R.WarperCreator().create(50.0)
    assert w is not None


def test_calibrate_camera_ro():
    rng = np.random.RandomState(8)
    K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
    obj, img = [], []
    pts = np.zeros((24, 3))
    pts[:, 0] = (np.arange(24) % 6) * 0.1
    pts[:, 1] = (np.arange(24) // 6) * 0.1
    for v in range(4):
        rvec = rng.randn(3) * 0.25
        tvec = np.r_[rng.randn(2) * 0.1, 2.0 + 0.3 * v]
        p, _ = cv2.projectPoints(pts, rvec, tvec, K, None)
        obj.append(pts.astype(np.float32))
        img.append(p.astype(np.float32))
    rms, k, dist, rv, tv, new_obj = R.calibrateCameraRO(
        obj, img, (640, 480), 1)
    assert rms < 0.5
    np.testing.assert_allclose(k[0, 0], 500, rtol=0.05)
    out = R.calibrateCameraROExtended(obj, img, (640, 480), 1)
    assert len(out) == 10 and (out[9] < 0.5).all()


def test_stereo_calibrate_extended():
    rng = np.random.RandomState(9)
    K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
    Rr, _ = cv2.Rodrigues(np.r_[0.02, 0.03, 0.01])
    T = np.r_[-0.2, 0.01, 0.02]
    pts = np.zeros((24, 3))
    pts[:, 0] = (np.arange(24) % 6) * 0.1
    pts[:, 1] = (np.arange(24) // 6) * 0.1
    obj, i1, i2 = [], [], []
    for v in range(3):
        rv = rng.randn(3) * 0.1
        tv = np.r_[rng.randn(2) * 0.05, 2.0 + 0.2 * v]
        R1, _ = cv2.Rodrigues(rv)
        pc = pts @ R1.T + tv
        p1 = (pc / pc[:, 2:]) @ K.T
        pc2 = pc @ Rr.T + T
        p2 = (pc2 / pc2[:, 2:]) @ K.T
        obj.append(pts.astype(np.float32))
        i1.append(p1[:, :2].reshape(-1, 1, 2).astype(np.float32))
        i2.append(p2[:, :2].reshape(-1, 1, 2).astype(np.float32))
    out = R.stereoCalibrateExtended(obj, i1, i2, K, None, K, None,
                                    (640, 480))
    rms, _, _, _, _, Rg, Tg, E, F, rvecs, tvecs, pve = out
    np.testing.assert_allclose(Rg, Rr, atol=1e-3)
    np.testing.assert_allclose(Tg.ravel(), T, atol=1e-3)
    assert len(rvecs) == 3 and pve.shape == (3, 2)


def test_video_capture_wait_any(tmp_path):
    path = str(tmp_path / "w.avi")
    w = R.VideoWriter(path, R.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    frame = np.zeros((24, 32, 3), np.uint8)
    for _ in range(2):
        w.write(frame)
    w.release()
    cap = R.VideoCapture(path)
    ok, ready = R.VideoCapture_waitAny([cap])
    assert ok and ready == [0]
    cap.release()

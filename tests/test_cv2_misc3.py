"""Cross-validate the batch-F facade surface against OpenCV 5.0."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")


def test_type_helpers():
    for fn in ("CV_8UC", "CV_8SC", "CV_16UC", "CV_16SC", "CV_32SC",
               "CV_32FC", "CV_64FC", "CV_16FC", "CV_16BFC", "CV_32UC",
               "CV_64UC", "CV_64SC"):
        for n in (1, 2, 3, 4):
            assert getattr(R, fn)(n) == getattr(cv2, fn)(n), (fn, n)
    for d in range(13):
        for n in (1, 2, 4):
            assert R.CV_MAKETYPE(d, n) == cv2.CV_MAKETYPE(d, n)


def test_keypoint_utils():
    kps = [R.KeyPoint(1, 2, 3), R.KeyPoint(4, 5, 6)]
    pts = R.KeyPoint_convert(kps)
    np.testing.assert_array_equal(pts, [[1, 2], [4, 5]])
    back = R.KeyPoint_convert(np.asarray(pts, np.float32), size=7)
    assert back[0].pt == (1.0, 2.0) and back[0].size == 7
    for d in (0.0, 3.0, 9.99, 10.0, 12.0):
        g = R.KeyPoint_overlap(R.KeyPoint(0, 0, 10), R.KeyPoint(d, 0, 10))
        w = cv2.KeyPoint_overlap(cv2.KeyPoint(0, 0, 10),
                                 cv2.KeyPoint(float(d), 0, 10))
        assert g == pytest.approx(w, abs=1e-6)
    g = R.KeyPoint_overlap(R.KeyPoint(0, 0, 10), R.KeyPoint(1, 1, 4))
    w = cv2.KeyPoint_overlap(cv2.KeyPoint(0, 0, 10), cv2.KeyPoint(1, 1, 4))
    assert g == pytest.approx(w, abs=1e-6)


def test_gftt_detector():
    rng = np.random.RandomState(0)
    img = np.zeros((64, 64), np.uint8)
    for _ in range(6):
        x, y = rng.randint(8, 56, 2)
        img[y:y + 6, x:x + 6] = rng.randint(120, 255)
    kps = R.GFTTDetector_create(20, 0.01, 5).detect(img)
    assert len(kps) >= 4
    assert all(isinstance(k, R.KeyPoint) for k in kps)


def test_emd():
    s1 = np.array([[0.4, 0, 0], [0.6, 1, 1]], np.float32)
    s2 = np.array([[0.5, 0, 1], [0.5, 1, 0]], np.float32)
    g, _, gf = R.EMD(s1, s2, cv2.DIST_L2)
    w, _, wf = cv2.EMD(s1, s2, cv2.DIST_L2)
    assert g == pytest.approx(w, abs=1e-6)
    np.testing.assert_allclose(gf, wf, atol=1e-6)
    # user cost matrix
    c = np.array([[1.0, 2.0], [0.5, 3.0]], np.float32)
    g2 = R.EMD(s1, s2, cv2.DIST_USER, cost=c)[0]
    w2 = cv2.EMD(s1, s2, cv2.DIST_USER, cost=c)[0]
    assert g2 == pytest.approx(w2, abs=1e-6)


def test_hough_with_accumulator():
    img = np.zeros((64, 96), np.uint8)
    cv2.line(img, (5, 30), (90, 30), 255, 1)
    out = R.HoughLinesWithAccumulator(img, 1, np.pi / 180, 40)
    assert out is not None and out.shape[-1] == 3
    rho, theta, votes = out.reshape(-1, 3)[0]
    assert votes >= 40
    assert abs(theta - np.pi / 2) < 0.05  # horizontal line
    assert abs(abs(rho) - 30) < 2
    circ = np.zeros((96, 96), np.uint8)
    cv2.circle(circ, (48, 48), 20, 255, 2)
    out = R.HoughCirclesWithAccumulator(circ, cv2.HOUGH_GRADIENT, 2, 20,
                                        param1=100, param2=20,
                                        minRadius=15, maxRadius=25)
    assert out is not None
    x, y, r, v = out.reshape(-1, 4)[0]
    assert abs(x - 48) <= 3 and abs(y - 48) <= 3 and abs(r - 20) <= 3


def test_hough_lines_point_set():
    # points on the line x*cos(0)= 30 (vertical rho=30, theta=0)
    pts = np.array([[30.0, y] for y in range(0, 60, 3)], np.float32)
    pts = pts.reshape(-1, 1, 2)
    g = R.HoughLinesPointSet(pts, 5, 10, 0.0, 100.0, 1.0, 0.0,
                             np.pi / 2, np.pi / 180)
    w = cv2.HoughLinesPointSet(pts, 5, 10, 0.0, 100.0, 1.0, 0.0,
                               np.pi / 2, np.pi / 180)
    gv = g.reshape(-1, 3)[0]
    wv = np.asarray(w).reshape(-1, 3)[0]
    assert gv[0] == wv[0]  # votes
    assert abs(gv[1] - wv[1]) < 1.01 and abs(gv[2] - wv[2]) < 0.02


def test_build_mst():
    edges = [R.MSTEdge(0, 1, 1.0), R.MSTEdge(1, 2, 2.0),
             R.MSTEdge(0, 2, 0.5)]
    ok, out = R.buildMST(3, edges, 0)
    assert ok and len(out) == 2
    assert sorted(e.weight for e in out) == [0.5, 1.0]
    ok, out = R.buildMST(4, edges, 0)  # node 3 unreachable
    assert not ok and out == []


def test_broadcast():
    a = np.ones((1, 3), np.float32)
    g = R.broadcast(a, np.array([4, 3], np.int32))
    w = cv2.broadcast(a, np.array([4, 3], np.int32))
    np.testing.assert_array_equal(g, w)


def test_filter2dp():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16), np.uint8)
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    g = R.filter2Dp(img, k, ddepth=cv2.CV_32F, scale=2.0, shift=3.0)
    w = cv2.filter2Dp(img, k, ddepth=cv2.CV_32F, scale=2.0, shift=3.0)
    inner = slice(1, -1)
    np.testing.assert_allclose(g[inner, inner], w[inner, inner],
                               atol=1e-3)


def test_project_points_sep_j():
    rng = np.random.RandomState(2)
    K = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
    obj = rng.rand(6, 3) * 2
    obj[:, 2] += 4
    rv, tv = np.r_[0.1, -0.2, 0.15], np.r_[0.3, -0.1, 6.0]
    dist = np.array([0.05, -0.02, 0.001, 0.001, 0.0])
    g = R.projectPointsSepJ(obj, rv, tv, K, dist)
    w = cv2.projectPointsSepJ(obj, rv, tv, K, dist)
    np.testing.assert_allclose(g[0], w[0], atol=1e-8)
    for gi, wi in zip(g[1:6], w[1:6]):
        np.testing.assert_allclose(gi, wi, rtol=1e-4, atol=1e-4)


def test_trackbar_state_machine():
    seen = []
    R.namedWindow("w")
    R.createTrackbar("t", "w", 5, 100, seen.append)
    assert R.getTrackbarPos("t", "w") == 5
    R.setTrackbarPos("t", "w", 42)
    assert R.getTrackbarPos("t", "w") == 42
    assert seen == [42]
    R.setTrackbarMax("t", "w", 30)
    assert R.getTrackbarPos("t", "w") == 30
    R.setTrackbarMin("t", "w", 35)
    assert R.getTrackbarPos("t", "w") == 35
    R.setMouseCallback("w", lambda *a: None)
    R.setWindowProperty("w", 0, 1.0)
    assert R.startWindowThread() == 0
    R.destroyAllWindows()


def test_dnn_guards_raise():
    for cls in (R.TrackerDaSiamRPN, R.TrackerNano, R.TrackerVit,
                R.ALIKED, R.DISK, R.LightGlueMatcher, R.FaceDetectorYN,
                R.FaceRecognizerSF):
        with pytest.raises(NotImplementedError):
            cls()
    with pytest.raises(NotImplementedError):
        R.TrackerVit_create()


def test_barcode_roundtrip():
    from rustcv_tpu.ops.barcode import draw_barcode, encode_ean13

    bits = encode_ean13([4, 0, 0, 6, 3, 8, 1, 3, 3, 9, 3, 1])
    img = draw_barcode(bits, module_px=3, height=60)
    det = R.barcode.BarcodeDetector()
    text, kind, _ = det.detectAndDecode(img)
    assert kind == "EAN_13" and len(text) == 13
    assert text.startswith("400638133931")
    ok, texts, _, kinds = det.detectAndDecodeMulti(img)
    assert ok and texts[0] == text
    assert R.barcode_BarcodeDetector().detectAndDecode(img)[0] == text


def test_fisheye_module():
    K = np.array([[300.0, 0, 320], [0, 300, 240], [0, 0, 1]])
    D = np.array([0.1, -0.05, 0.01, -0.002])
    rng = np.random.RandomState(3)
    obj = rng.rand(10, 3)
    obj[:, 2] += 3
    rv, tv = np.r_[0.05, -0.1, 0.02], np.r_[0.1, 0.05, 1.0]
    g, _ = R.fisheye.projectPoints(obj.reshape(-1, 1, 3), rv, tv, K, D)
    w, _ = cv2.fisheye.projectPoints(obj.reshape(-1, 1, 3), rv, tv, K, D)
    np.testing.assert_allclose(g, w, atol=1e-6)
    # undistort inverts distort
    px = (rng.rand(6, 1, 2) * [200, 150] + [220, 160]).astype(np.float64)
    dd = R.fisheye.distortPoints(px, K, D, Kundistorted=K)
    # cv2 5's binding only exposes the normalized-input form; compose
    norm = (px.reshape(-1, 2) - [K[0, 2], K[1, 2]]) / [K[0, 0], K[1, 1]]
    wd = cv2.fisheye.distortPoints(norm.reshape(-1, 1, 2), K, D)
    wd = wd.reshape(px.shape)
    np.testing.assert_allclose(dd, wd, atol=1e-4)
    nn = (rng.rand(4, 1, 2) - 0.5) * 0.8  # normalized-coord default
    np.testing.assert_allclose(R.fisheye.distortPoints(nn, K, D),
                               cv2.fisheye.distortPoints(nn, K, D),
                               atol=1e-6)
    und_w = cv2.fisheye.undistortPoints(dd, K, D, P=K)
    und_g = R.fisheye.undistortPoints(dd, K, D, P=K)
    np.testing.assert_allclose(und_g, und_w, atol=1e-3)
    np.testing.assert_allclose(und_g, px, atol=1e-3)


def test_fisheye_calibrate():
    K = np.array([[300.0, 0, 320], [0, 300, 240], [0, 0, 1]])
    D = np.array([0.08, -0.03, 0.004, -0.001])
    rng = np.random.RandomState(4)
    pts = np.zeros((24, 3))
    pts[:, 0] = (np.arange(24) % 6) * 0.1
    pts[:, 1] = (np.arange(24) // 6) * 0.1
    objs, imgs = [], []
    for v in range(5):
        rv = rng.randn(3) * 0.3
        tv = np.r_[rng.randn(2) * 0.1, 1.5 + 0.2 * v]
        p, _ = cv2.fisheye.projectPoints(pts.reshape(-1, 1, 3), rv, tv,
                                         K, D)
        objs.append(pts.astype(np.float32))
        imgs.append(np.asarray(p, np.float32))
    rms, Kg, Dg, rvs, tvs = R.fisheye.calibrate(objs, imgs, (640, 480))
    assert rms < 0.1
    np.testing.assert_allclose(Kg[0, 0], 300, rtol=0.02)
    np.testing.assert_allclose(Dg.ravel()[0], 0.08, atol=0.02)


def test_submodules_exist():
    assert R.flann.Index is not None
    assert R.flann.FLANN_INDEX_TYPE_32F == cv2.flann.FLANN_INDEX_TYPE_32F
    assert R.mcc.CCheckerDetector is not None
    assert R.ccm.ColorCorrectionModel is not None
    assert R.segmentation.IntelligentScissorsMB is not None
    assert isinstance(R.data.haarcascades, str)
    assert R.videoio_registry.getBackendName(1800) == "V4L2"
    assert R.videoio_registry.hasBackend(1800)
    assert R.getDefaultAlgorithmHint() in (cv2.ALGO_HINT_ACCURATE,
                                           cv2.ALGO_HINT_DEFAULT)
    # flat aruco aliases
    assert R.aruco_DetectorParameters() is not None
    d = R.aruco_Dictionary(R.aruco.DICT_4X4_50)
    assert d is not None


def test_ecc_with_mask_guard():
    rng = np.random.RandomState(5)
    a = cv2.GaussianBlur((rng.rand(32, 32) * 255).astype(np.float32),
                         (5, 5), 1.5)
    b = np.roll(a, 1, axis=1)
    cc, W = R.findTransformECCWithMask(a, b, np.eye(2, 3,
                                                    dtype=np.float32), 0)
    assert abs(W[0, 2] - 1.0) < 0.3
    with pytest.raises(NotImplementedError):
        mask = np.zeros((32, 32), np.uint8)
        mask[:16] = 1
        R.findTransformECCWithMask(a, b, np.eye(2, 3, dtype=np.float32),
                                   0, None, mask)


def test_param_holders():
    s = R.OdometrySettings()
    s.setCameraMatrix(np.eye(3))
    assert s.getCameraMatrix().shape == (3, 3)
    v = R.VolumeSettings()
    v.setVoxelSize(0.05)
    assert v.getVoxelSize() == 0.05
    assert R.CirclesGridFinderParameters().minDensity == 10.0
    assert R.ECCParameters().maxCount == 50
    assert R.QRCodeEncoder_Params().version == 0
    assert R.QRCodeDetectorAruco_Params().maxRotation == pytest.approx(
        0.17)
    assert R.FontFace("sans").getName() == "sans"
    with pytest.raises(NotImplementedError):
        R.calibrateMultiview()
    with pytest.raises(NotImplementedError):
        R.selectROI("w")
    assert R.bootstrap() is None

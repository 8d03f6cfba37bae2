"""Cross-validate rustcv_tpu.cv2._util against real OpenCV 5.0."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")


def test_version_surface():
    assert R.getVersionMajor() == cv2.getVersionMajor() == 5
    assert isinstance(R.getVersionString(), str)
    assert R.getTickFrequency() > 0
    t0 = R.getTickCount()
    assert R.getTickCount() >= t0
    assert R.getNumberOfCPUs() >= 1
    R.setNumThreads(3)
    assert R.getNumThreads() == 3
    R.setNumThreads(0)
    assert R.getNumThreads() >= 1
    R.setUseOptimized(False)
    assert not R.useOptimized()
    R.setUseOptimized(True)
    assert "rustcv" in R.getBuildInformation()


def test_sum_elems():
    rng = np.random.RandomState(0)
    for shape in [(7, 5), (7, 5, 3), (4, 4, 4)]:
        a = rng.randint(0, 255, shape, dtype=np.uint8)
        assert R.sumElems(a) == cv2.sumElems(a)
    f = rng.rand(6, 6).astype(np.float32)
    np.testing.assert_allclose(R.sumElems(f), cv2.sumElems(f), rtol=1e-6)


def test_blend_linear():
    rng = np.random.RandomState(1)
    s1 = rng.randint(0, 255, (8, 9), np.uint8)
    s2 = rng.randint(0, 255, (8, 9), np.uint8)
    w1 = rng.rand(8, 9).astype(np.float32)
    w2 = rng.rand(8, 9).astype(np.float32)
    np.testing.assert_array_equal(R.blendLinear(s1, s2, w1, w2),
                                  cv2.blendLinear(s1, s2, w1, w2))
    c1 = rng.randint(0, 255, (8, 9, 3), np.uint8)
    c2 = rng.randint(0, 255, (8, 9, 3), np.uint8)
    got = R.blendLinear(c1, c2, w1, w2)
    want = cv2.blendLinear(c1, c2, w1, w2)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batch_distance_knn():
    rng = np.random.RandomState(2)
    x = rng.rand(6, 5).astype(np.float32)
    y = rng.rand(9, 5).astype(np.float32)
    for nt in (cv2.NORM_L2, cv2.NORM_L1, cv2.NORM_L2SQR):
        dg, ig = R.batchDistance(x, y, cv2.CV_32F, K=3, normType=nt)
        dw, iw = cv2.batchDistance(x, y, cv2.CV_32F, K=3, normType=nt)
        np.testing.assert_array_equal(ig, iw)
        np.testing.assert_allclose(dg, dw, rtol=1e-5)
    a = rng.randint(0, 255, (4, 8), np.uint8)
    b = rng.randint(0, 255, (7, 8), np.uint8)
    dg, ig = R.batchDistance(a, b, cv2.CV_32S, K=1,
                             normType=cv2.NORM_HAMMING)
    dw, iw = cv2.batchDistance(a, b, cv2.CV_32S, K=1,
                               normType=cv2.NORM_HAMMING)
    np.testing.assert_array_equal(ig, iw)
    np.testing.assert_array_equal(dg, dw)
    # K=0 full matrix (inexpressible through cv2 5.0's binding)
    d, ni = R.batchDistance(x, y, cv2.CV_32F)
    assert d.shape == (6, 9) and ni is None


def test_accumulate_family():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 255, (6, 7), np.uint8)
    src2 = rng.randint(0, 255, (6, 7), np.uint8)
    mask = (rng.rand(6, 7) > 0.5).astype(np.uint8)
    for fn, args in [
        ("accumulate", (src,)),
        ("accumulateSquare", (src,)),
        ("accumulateProduct", (src, src2)),
    ]:
        dg = rng.rand(6, 7).astype(np.float32)
        dw = dg.copy()
        getattr(R, fn)(*args, dg)
        getattr(cv2, fn)(*args, dw)
        np.testing.assert_allclose(dg, dw, rtol=1e-5)
        dg2, dw2 = dg.copy(), dw.copy()
        getattr(R, fn)(*args, dg2, mask=mask)
        getattr(cv2, fn)(*args, dw2, mask=mask)
        np.testing.assert_allclose(dg2, dw2, rtol=1e-5)
    dg = rng.rand(6, 7).astype(np.float32)
    dw = dg.copy()
    R.accumulateWeighted(src, dg, 0.3)
    cv2.accumulateWeighted(src, dw, 0.3)
    np.testing.assert_allclose(dg, dw, rtol=1e-5)
    dg2, dw2 = dg.copy(), dw.copy()
    R.accumulateWeighted(src, dg2, 0.3, mask=mask)
    cv2.accumulateWeighted(src, dw2, 0.3, mask=mask)
    np.testing.assert_allclose(dg2, dw2, rtol=1e-5)


def test_get_rect_sub_pix():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (12, 14), np.uint8)
    for center in [(4.3, 5.7), (0.0, 0.0), (13.9, 11.2), (6.5, 6.5)]:
        got = R.getRectSubPix(img, (5, 3), center)
        want = cv2.getRectSubPix(img, (5, 3), center)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    f = rng.rand(10, 10).astype(np.float32)
    got = R.getRectSubPix(f, (4, 4), (3.25, 2.75))
    want = cv2.getRectSubPix(f, (4, 4), (3.25, 2.75))
    np.testing.assert_allclose(got, want, atol=1e-5)
    c = rng.randint(0, 255, (9, 9, 3), np.uint8)
    got = R.getRectSubPix(c, (3, 3), (4.6, 4.2))
    want = cv2.getRectSubPix(c, (3, 3), (4.6, 4.2))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_get_deriv_kernels():
    for dx, dy, k in [(1, 0, 3), (0, 1, 3), (1, 2, 3), (2, 2, 7),
                      (1, 1, 5), (1, 0, 1), (3, 0, 7)]:
        for norm in (False, True):
            gx, gy = R.getDerivKernels(dx, dy, k, normalize=norm)
            wx, wy = cv2.getDerivKernels(dx, dy, k, normalize=norm)
            np.testing.assert_allclose(gx, wx, rtol=1e-6)
            np.testing.assert_allclose(gy, wy, rtol=1e-6)
    for dx, dy in [(1, 0), (0, 1)]:
        for norm in (False, True):
            gx, gy = R.getDerivKernels(dx, dy, -1, normalize=norm)
            wx, wy = cv2.getDerivKernels(dx, dy, -1, normalize=norm)
            np.testing.assert_allclose(gx, wx, rtol=1e-6)
            np.testing.assert_allclose(gy, wy, rtol=1e-6)


def test_get_default_new_camera_matrix():
    K = np.array([[100.0, 0, 50], [0, 90, 40], [0, 0, 1]])
    np.testing.assert_allclose(
        R.getDefaultNewCameraMatrix(K, (64, 48), True),
        cv2.getDefaultNewCameraMatrix(K, (64, 48), True))
    np.testing.assert_allclose(R.getDefaultNewCameraMatrix(K),
                               cv2.getDefaultNewCameraMatrix(K))


def test_get_font_scale_from_height():
    for f in range(8):
        for h in (12, 20, 37):
            assert R.getFontScaleFromHeight(f, h, 1) == pytest.approx(
                cv2.getFontScaleFromHeight(f, h, 1))
    fi = cv2.FONT_HERSHEY_SIMPLEX | cv2.FONT_ITALIC
    assert R.getFontScaleFromHeight(fi, 25, 2) == pytest.approx(
        cv2.getFontScaleFromHeight(fi, 25, 2))


def test_homogeneous_points():
    rng = np.random.RandomState(5)
    p2 = rng.rand(7, 2).astype(np.float32)
    np.testing.assert_allclose(R.convertPointsToHomogeneous(p2),
                               cv2.convertPointsToHomogeneous(p2), rtol=1e-6)
    p3 = rng.rand(7, 3).astype(np.float32)
    p3[3, 2] = 0.0  # w=0 row: cv2 leaves the point unscaled
    np.testing.assert_allclose(R.convertPointsFromHomogeneous(p3),
                               cv2.convertPointsFromHomogeneous(p3),
                               rtol=1e-5)
    p21 = p2[:, None, :]
    np.testing.assert_allclose(R.convertPointsToHomogeneous(p21),
                               cv2.convertPointsToHomogeneous(p21),
                               rtol=1e-6)


def test_rotated_rect():
    for args in [((10, 20), (4, 6), 30.0), ((0, 0), (5, 5), 0.0),
                 ((3.5, -2), (7, 2), -75.0)]:
        g = R.RotatedRect(*args)
        w = cv2.RotatedRect(*args)
        np.testing.assert_allclose(g.points(), w.points(), atol=1e-4)
        assert g.boundingRect() == tuple(w.boundingRect())


def test_tick_meter():
    tm = R.TickMeter()
    tm.start()
    tm.stop()
    assert tm.getCounter() == 1
    assert tm.getTimeSec() >= 0
    assert tm.getTimeMilli() == pytest.approx(tm.getTimeSec() * 1e3)
    tm.reset()
    assert tm.getCounter() == 0


def test_umat_roundtrip():
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    u = R.UMat(a)
    np.testing.assert_array_equal(u.get(), a)
    u2 = R.UMat(u)
    np.testing.assert_array_equal(u2.get(), a)


def test_video_writer_fourcc_and_roundtrip(tmp_path):
    assert R.VideoWriter_fourcc(*"MJPG") == cv2.VideoWriter_fourcc(*"MJPG")
    path = str(tmp_path / "out.avi")
    rng = np.random.RandomState(6)
    frames = [rng.randint(0, 255, (48, 64, 3), np.uint8) for _ in range(3)]
    w = R.VideoWriter(path, R.VideoWriter_fourcc(*"MJPG"), 15.0, (64, 48))
    assert w.isOpened()
    for f in frames:
        w.write(f)
    w.release()
    assert not w.isOpened()
    # read back with our own AVI reader via the cv2 facade VideoCapture
    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (48, 64, 3)
        n += 1
    cap.release()
    assert n == 3


def test_image_io_extras(tmp_path):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (16, 20, 3), np.uint8)
    p = str(tmp_path / "x.png")
    assert not R.haveImageReader(p)
    R.imwrite(p, img)
    assert R.haveImageReader(p) == cv2.haveImageReader(p) is True
    assert R.haveImageWriter(p) == cv2.haveImageWriter(p) is True
    assert R.imcount(p) == 1
    ok, frames = R.imreadmulti(p)
    assert ok and len(frames) == 1
    np.testing.assert_array_equal(frames[0], img)
    # multi-page tiff
    t = str(tmp_path / "m.tif")
    imgs = [rng.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(3)]
    assert R.imwritemulti(t, imgs)
    assert R.imcount(t) == 3
    ok, back = R.imreadmulti(t)
    assert ok and len(back) == 3
    for a, b in zip(imgs, back):
        np.testing.assert_array_equal(a, b)


def test_error_class():
    with pytest.raises(R.error):
        raise R.error("boom")

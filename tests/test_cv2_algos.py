"""Cross-validate rustcv_tpu.cv2._algos against real OpenCV 5.0."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")


def _pair(shift=2, shape=(48, 64), seed=0):
    rng = np.random.RandomState(seed)
    a = cv2.GaussianBlur((rng.rand(*shape) * 255).astype(np.uint8),
                         (5, 5), 1.5)
    b = np.roll(a, shift, axis=1)
    return a, b


def test_constants_match_cv2():
    names = [n for n in (
        "FastFeatureDetector_TYPE_5_8 FastFeatureDetector_TYPE_9_16 "
        "FastFeatureDetector_THRESHOLD DescriptorMatcher_BRUTEFORCE "
        "DescriptorMatcher_BRUTEFORCE_HAMMING DescriptorMatcher_FLANNBASED "
        "StereoMatcher_DISP_SHIFT StereoMatcher_DISP_SCALE "
        "StereoBM_PREFILTER_XSOBEL StereoSGBM_MODE_HH "
        "Stitcher_OK Stitcher_ERR_NEED_MORE_IMGS Stitcher_PANORAMA "
        "Subdiv2D_PTLOC_INSIDE Subdiv2D_NEXT_AROUND_DST "
        "Subdiv2D_PREV_AROUND_LEFT QRCodeEncoder_CORRECT_LEVEL_H "
        "QRCodeEncoder_MODE_BYTE QRCodeEncoder_ECI_UTF8 "
        "DISOpticalFlow_PRESET_MEDIUM FILTER_SCHARR").split()]
    for n in names:
        assert getattr(R, n) == getattr(cv2, n), n


def test_dis_optical_flow():
    a, b = _pair(shift=2)
    ours = R.DISOpticalFlow_create(R.DISOpticalFlow_PRESET_MEDIUM)
    f = ours.calc(a, b, None)
    assert f.shape == (48, 64, 2) and f.dtype == np.float32
    inner = f[8:-8, 8:-8]
    assert abs(inner[..., 0].mean() - 2.0) < 0.4
    assert abs(inner[..., 1].mean()) < 0.3


def test_farneback_class():
    a, b = _pair(shift=2, seed=1)
    f = R.FarnebackOpticalFlow_create().calc(a, b, None)
    inner = f[8:-8, 8:-8]
    assert abs(inner[..., 0].mean() - 2.0) < 0.4


def test_sparse_pyr_lk_class():
    a, b = _pair(shift=3, seed=2)
    p0 = np.array([[[20.0, 20.0]], [[40.0, 30.0]]], np.float32)
    p1, st, err = R.SparsePyrLKOpticalFlow_create().calc(a, b, p0, None)
    moved = p1.reshape(-1, 2) - p0.reshape(-1, 2)
    assert st.ravel().all()
    np.testing.assert_allclose(moved[:, 0], 3.0, atol=0.3)
    np.testing.assert_allclose(moved[:, 1], 0.0, atol=0.3)


def test_variational_refinement():
    a, b = _pair(shift=2, seed=3)
    vr = R.VariationalRefinement_create()
    init = np.zeros((48, 64, 2), np.float32)
    init[..., 0] = 1.5  # a biased initial field
    out = vr.calc(a, b, init)
    inner = out[8:-8, 8:-8]
    # refinement must move the field toward the true shift of 2
    assert abs(inner[..., 0].mean() - 2.0) < 0.4


def test_line_segment_detector():
    img = np.zeros((64, 96), np.uint8)
    cv2.line(img, (10, 20), (80, 20), 255, 2)
    cv2.line(img, (30, 10), (30, 55), 255, 2)
    lines, widths, precs, nfa = R.createLineSegmentDetector().detect(img)
    assert lines is not None and lines.shape[1:] == (1, 4)
    segs = lines.reshape(-1, 4)
    # at least one roughly-horizontal and one roughly-vertical segment
    dx = np.abs(segs[:, 2] - segs[:, 0])
    dy = np.abs(segs[:, 3] - segs[:, 1])
    assert (dx > 3 * dy).any() and (dy > 3 * dx).any()
    canvas = np.zeros((64, 96, 3), np.uint8)
    R.createLineSegmentDetector().drawSegments(canvas, lines)
    assert (canvas[..., 2] > 0).any()


def test_generalized_hough_ballard():
    templ = np.zeros((24, 24), np.uint8)
    cv2.rectangle(templ, (4, 4), (19, 19), 255, 2)
    scene = np.zeros((96, 128), np.uint8)
    cv2.rectangle(scene, (50 - 8, 40 - 8), (50 + 7, 40 + 7), 255, 2)
    gh = R.createGeneralizedHoughBallard()
    gh.setTemplate(templ)
    gh.setVotesThreshold(20)
    pos, votes = gh.detect(scene)
    assert pos is not None
    best = pos.reshape(-1, 4)[0]
    assert abs(best[0] - 50) <= 3 and abs(best[1] - 40) <= 3


def test_mser_class():
    img = np.full((64, 96), 255, np.uint8)
    cv2.circle(img, (30, 30), 10, 0, -1)
    cv2.circle(img, (70, 40), 8, 0, -1)
    regions, bboxes = R.MSER_create().detectRegions(img)
    assert len(regions) >= 2
    assert bboxes.shape[1] == 4
    kps = R.MSER_create().detect(img)
    assert len(kps) >= 2


def test_simple_blob_detector():
    img = np.full((96, 128), 255, np.uint8)
    for c, r in [((30, 30), 6), ((80, 50), 8), ((50, 75), 7)]:
        cv2.circle(img, c, r, 0, -1)
    kps = R.SimpleBlobDetector_create().detect(img)
    got = sorted((round(k.pt[0]), round(k.pt[1])) for k in kps)
    want = sorted([(30, 30), (80, 50), (50, 75)])
    assert len(got) == 3
    for g, w in zip(got, want):
        assert abs(g[0] - w[0]) <= 1 and abs(g[1] - w[1]) <= 1


def test_affine_feature_matches_itself():
    rng = np.random.RandomState(4)
    img = cv2.GaussianBlur((rng.rand(96, 128) * 255).astype(np.uint8),
                           (3, 3), 1.0)
    kp, desc = R.AffineFeature_create().detectAndCompute(img, None)
    assert len(kp) > 10 and desc.shape[0] == len(kp)


def test_descriptor_matcher_create():
    rng = np.random.RandomState(5)
    d1 = rng.rand(10, 16).astype(np.float32)
    d2 = rng.rand(12, 16).astype(np.float32)
    for name in ("BruteForce", "BruteForce-L1", "FlannBased"):
        m = R.DescriptorMatcher_create(name)
        ms = m.match(d1, d2)
        assert len(ms) == 10
    m = R.DescriptorMatcher_create(R.DescriptorMatcher_BRUTEFORCE)
    ours = sorted((x.queryIdx, x.trainIdx) for x in m.match(d1, d2))
    wm = cv2.DescriptorMatcher_create("BruteForce")
    want = sorted((x.queryIdx, x.trainIdx) for x in wm.match(d1, d2))
    assert ours == want
    b = R.BFMatcher_create(cv2.NORM_L2, crossCheck=True)
    assert len(b.match(d1, d2)) <= 10


def test_hdr_class_aliases():
    rng = np.random.RandomState(6)
    imgs = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(3)]
    times = np.array([0.25, 0.5, 1.0], np.float32)
    out = R.MergeMertens().process(imgs)
    assert out.shape == (16, 16, 3) and out.dtype == np.float32
    hdr = R.MergeDebevec().process(imgs, times)
    assert hdr.dtype == np.float32
    ld = R.TonemapReinhard().process(hdr)
    assert ld.dtype == np.float32
    aligned = R.AlignMTB().process(imgs)
    assert len(aligned) == 3


def test_stitcher_class():
    rng = np.random.RandomState(7)
    base = cv2.GaussianBlur((rng.rand(120, 200, 3) * 255).astype(np.uint8),
                            (3, 3), 1.0)
    left = base[:, :120]
    right = base[:, 60:]
    st = R.Stitcher_create(R.Stitcher_PANORAMA)
    status, pano = st.stitch([left, right])
    assert status == R.Stitcher_OK
    assert pano.shape[1] >= 190
    status, _ = st.stitch([left])
    assert status == R.Stitcher_ERR_NEED_MORE_IMGS


def test_subdiv2d_class():
    pts = [(10, 10), (80, 20), (50, 90), (30, 40)]
    g = R.Subdiv2D((0, 0, 100, 100))
    w = cv2.Subdiv2D((0, 0, 100, 100))
    for p in pts:
        g.insert(p)
        w.insert(p)
    gt = g.getTriangleList()
    wt = w.getTriangleList()
    canon = lambda t: sorted(  # noqa: E731
        tuple(sorted(map(tuple, tri.reshape(3, 2).tolist())))
        for tri in t)
    assert canon(gt) == canon(wt)
    ge = g.getEdgeList()
    assert ge.shape[1] == 4
    i, p = g.findNearest((52, 88))
    assert tuple(p) == (50.0, 90.0)
    facets, centers = g.getVoronoiFacetList([])
    assert len(facets) == 4 and len(centers) == 4


def test_octree_class():
    rng = np.random.RandomState(8)
    pts = rng.rand(50, 3)
    t = R.Octree.fromPointCloud(pts)
    assert t.isPointInBounds(pts[0])
    t2 = R.Octree_createWithResolution(0.1, size=2.0, origin=(0, 0, 0))
    t2.insertPoint((0.5, 0.5, 0.5))
    assert t2.isPointInBounds((0.5, 0.5, 0.5))


def test_odometry_class():
    K = np.array([[120.0, 0, 32], [0, 120, 24], [0, 0, 1]])
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    d0 = (1.0 + 0.3 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(
        np.float64)
    # pure forward translation of 2 cm
    d1 = d0 - 0.02
    od = R.Odometry()
    od.setCameraMatrix(K)
    ok, rt = od.compute(d0, d1)
    assert ok
    # p1 = R p0 + t: the surface moves 2 cm closer, so t_z ~ -0.02
    assert abs(rt[2, 3] - (-0.02)) < 0.01
    assert abs(rt[2, 3]) > abs(rt[0, 3]) and abs(rt[2, 3]) > abs(rt[1, 3])
    assert np.allclose(rt[:3, :3], np.eye(3), atol=0.05)


def test_volume_tsdf():
    K = np.array([[80.0, 0, 32], [0, 80, 24], [0, 0, 1]])
    depth = np.full((48, 64), 0.8, np.float64)
    v = R.Volume(resolution=32, voxelSize=0.05)
    v.setCameraIntrinsics(K)
    v.integrate(depth, np.eye(4))
    assert v.tsdf is not None


def test_qr_encoder_roundtrip():
    enc = R.QRCodeEncoder_create()
    m = enc.encode("HELLO WORLD")
    assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 255}
    # our detector must decode our encoder's output
    big = np.kron(255 - m, np.ones((8, 8), np.uint8))  # dark modules -> 0
    pad = np.full((big.shape[0] + 64, big.shape[1] + 64), 255, np.uint8)
    pad[32:32 + big.shape[0], 32:32 + big.shape[1]] = big
    det = R.QRCodeDetectorAruco()
    text, pts, _ = det.detectAndDecode(pad)
    assert text == "HELLO WORLD"


def test_flann_index():
    rng = np.random.RandomState(9)
    data = rng.rand(60, 4).astype(np.float32)
    q = rng.rand(5, 4).astype(np.float32)
    ours = R.flann_Index(data, {"algorithm": 1, "trees": 4})
    gi, gd = ours.knnSearch(q, 3)
    # exact answer: brute force
    d2 = ((q[:, None, :] - data[None]) ** 2).sum(-1)
    want = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_array_equal(gi, want)
    n, ri, rd = ours.radiusSearch(q[0], 0.25, 10)
    assert (rd.ravel()[:n] <= 0.25).all()


def test_py_rotation_warper():
    rng = np.random.RandomState(10)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    K = np.array([[100, 0, 32], [0, 100, 24], [0, 0, 1]], np.float32)
    Rm = np.eye(3, dtype=np.float32)
    for kind in ("spherical", "cylindrical", "plane"):
        g = R.PyRotationWarper(kind, 100.0)
        corner, warped = g.warp(img, K, Rm, cv2.INTER_LINEAR,
                                cv2.BORDER_CONSTANT)
        w = cv2.PyRotationWarper(kind, 100.0)
        wc, ww = w.warp(img, K, Rm, cv2.INTER_LINEAR, cv2.BORDER_CONSTANT)
        assert abs(corner[0] - wc[0]) <= 2 and abs(corner[1] - wc[1]) <= 2
        assert abs(warped.shape[0] - ww.shape[0]) <= 3
        assert abs(warped.shape[1] - ww.shape[1]) <= 3


def test_intelligent_scissors():
    img = np.zeros((64, 64), np.uint8)
    cv2.line(img, (10, 32), (54, 32), 255, 1)
    s = R.segmentation_IntelligentScissorsMB()
    s.applyImage(img)
    s.buildMap((10, 32))
    c = s.getContour((50, 32))
    assert c.shape[-1] == 2 and len(c) >= 30
    ys = c.reshape(-1, 2)[:, 1]
    assert np.abs(ys - 32).max() <= 2  # path follows the edge


def test_find_contours_link_runs():
    img = np.zeros((32, 32), np.uint8)
    cv2.rectangle(img, (5, 5), (20, 20), 255, -1)
    g = R.findContoursLinkRuns(img)
    w = cv2.findContoursLinkRuns(img)
    # cv2's link-runs contour is per-row run endpoints; ours the full
    # boundary — equivalent as filled regions
    gm = np.zeros_like(img)
    wm = np.zeros_like(img)
    cv2.drawContours(gm, [c.astype(np.int32) for c in g[0]], -1, 255, -1)
    cv2.drawContours(wm, list(w[0]), -1, 255, -1)
    np.testing.assert_array_equal(gm, wm)

"""cv2.detail pipeline driven end-to-end on a synthetic panorama."""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")


def _pano_pair(seed=0, h=140, w=260, overlap=90):
    rng = np.random.RandomState(seed)
    base = cv2.GaussianBlur(rng.randint(0, 255, (h, w, 3), np.uint8),
                            (3, 3), 1.0)
    left = base[:, :w // 2 + overlap // 2]
    right = base[:, w // 2 - overlap // 2:]
    return base, left, right, w // 2 - overlap // 2


def test_feature_match_estimate():
    _, left, right, offset = _pano_pair()
    sift = R.SIFT_create()
    feats = R.detail.computeImageFeatures(sift, [left, right])
    assert all(len(f.keypoints) > 10 for f in feats)
    matcher = R.detail.BestOf2NearestMatcher()
    mi = matcher.apply(feats[0], feats[1])
    assert mi.num_inliers >= 8
    assert mi.confidence > 0.5
    # translation-only scene: H should be近 translation by -offset
    assert mi.H is not None
    assert abs(mi.H[0, 2] + offset) < 2.0
    assert abs(mi.H[0, 0] - 1.0) < 0.05
    # apply2 yields the n*n grid
    grid = matcher.apply2(feats)
    assert len(grid) == 4
    comp = R.detail.leaveBiggestComponent(feats, grid, 0.3)
    assert sorted(comp.tolist()) == [0, 1]
    s = R.detail.matchesGraphAsString(["a", "b"], grid, 0.3)
    assert "matches_graph" in s and "Nm=" in s


def test_homography_estimator_and_wave_correct():
    _, left, right, _ = _pano_pair(seed=1)
    sift = R.SIFT_create()
    feats = R.detail.computeImageFeatures(sift, [left, right])
    grid = R.detail.BestOf2NearestMatcher().apply2(feats)
    ok, cams = R.detail.HomographyBasedEstimator().apply(feats, grid)
    assert ok and len(cams) == 2
    assert cams[0].focal > 0
    K = cams[0].K()
    assert K[0, 2] == left.shape[1] * 0.5
    rs = R.detail.waveCorrect([c.R for c in cams])
    assert len(rs) == 2
    for Rm in rs:
        np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-4)
    ok2, cams2 = R.detail.BundleAdjusterRay().apply(feats, grid, cams)
    assert ok2


def test_roi_helpers():
    ok, roi = R.detail.overlapRoi((0, 0), (5, 3), (10, 10), (10, 10))
    assert ok and tuple(roi) == (5, 3, 5, 7)
    ok2, _ = R.detail.overlapRoi((0, 0), (20, 0), (10, 10), (10, 10))
    assert not ok2
    g = R.detail.resultRoi([(0, 0), (5, 3)], [(10, 10), (10, 10)])
    w = cv2.detail.resultRoi([(0, 0), (5, 3)], [(10, 10), (10, 10)])
    assert tuple(g) == tuple(w)
    assert R.detail.resultTl([(4, 7), (2, 9)]) == (2, 7)


def test_gain_compensator():
    rng = np.random.RandomState(2)
    base = cv2.GaussianBlur(rng.randint(60, 200, (60, 120, 3), np.uint8),
                            (3, 3), 1.0)
    left = base[:, :80].astype(np.float64)
    right = np.clip(base[:, 40:] * 1.3, 0, 255)  # brighter exposure
    corners = [(0, 0), (40, 0)]
    masks = [np.full(left.shape[:2], 255, np.uint8),
             np.full(right.shape[:2], 255, np.uint8)]
    comp = R.detail.GainCompensator()
    comp.feed(corners, [left.astype(np.uint8),
                        right.astype(np.uint8)], masks)
    l2 = left.astype(np.uint8).copy()
    r2 = right.astype(np.uint8).copy()
    comp.apply(0, corners[0], l2, masks[0])
    comp.apply(1, corners[1], r2, masks[1])
    # after compensation the overlap means must be closer than before
    before = abs(float(left[:, 40:].mean()) - float(right[:, :40].mean()))
    after = abs(float(l2[:, 40:].mean()) - float(r2[:, :40].mean()))
    assert after < before * 0.5


def test_voronoi_seam_finder():
    m1 = np.zeros((40, 80), np.uint8)
    m2 = np.zeros((40, 80), np.uint8)
    m1[:, :50] = 255
    m2[:, 30:] = 255
    out = R.detail.VoronoiSeamFinder().find(
        [None, None], [(0, 0), (0, 0)], [m1, m2])
    s1, s2 = out
    # the seam splits the overlap near x=40, masks stay disjoint there
    assert not ((s1 > 0) & (s2 > 0)).any()
    assert (s1[:, :30] > 0).all() and (s2[:, 50:] > 0).all()
    union = (s1 > 0) | (s2 > 0)
    assert union[:, 30:50].all()


def test_blenders():
    rng = np.random.RandomState(3)
    base = cv2.GaussianBlur(rng.randint(0, 255, (40, 100, 3), np.uint8),
                            (3, 3), 1.0)
    left, right = base[:, :70], base[:, 30:]
    corners = [(0, 0), (30, 0)]
    sizes = [(70, 40), (70, 40)]
    for cls in (R.detail.Blender, R.detail.FeatherBlender,
                R.detail.MultiBandBlender):
        b = cls()
        b.prepare(corners, sizes)
        m = np.full((40, 70), 255, np.uint8)
        b.feed(left, m, (0, 0))
        b.feed(right, m, (30, 0))
        out, mask = b.blend()
        assert out.shape[:2] == (40, 100)
        assert (mask > 0).all()
        err = np.abs(out[:, 5:95].astype(int)
                     - base[:, 5:95].astype(int)).mean()
        assert err < 12.0, (cls.__name__, err)
    b = R.detail.Blender.createDefault(R.detail.Blender.MULTI_BAND)
    assert isinstance(b, R.detail.MultiBandBlender)


def test_laplace_pyr_roundtrip():
    rng = np.random.RandomState(4)
    img = rng.rand(32, 48, 3).astype(np.float32) * 255
    pyr = R.detail.createLaplacePyr(img, 3)
    assert len(pyr) == 4
    back = R.detail.restoreImageFromLaplacePyr(pyr)
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_weight_map():
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 255
    w = R.detail.createWeightMap(m, sharpness=0.5)
    assert w.max() <= 1.0 and w[10, 10] == 1.0 and w[0, 0] == 0.0
    n = R.detail.normalizeUsingWeightMap(np.maximum(w, 1e-9),
                                         np.ones((20, 20), np.float32))
    assert np.isfinite(n).all()


def test_timelapser():
    t = R.detail.Timelapser.createDefault(R.detail.Timelapser.AS_IS)
    t.initialize([(0, 0), (10, 0)], [(20, 20), (20, 20)])
    img = np.full((20, 20, 3), 100, np.uint8)
    t.process(img, None, (10, 0))
    d = t.getDst()
    assert d.shape == (20, 30, 3)
    assert (d[:, 10:30] == 100).all() and (d[:, :10] == 0).all()


def test_flat_detail_aliases():
    assert R.detail_BestOf2NearestMatcher is \
        R.detail.BestOf2NearestMatcher
    assert R.detail_MultiBandBlender is R.detail.MultiBandBlender
    assert R.detail_CameraParams is R.detail.CameraParams


def test_detail_pipeline_end_to_end():
    base, left, right, offset = _pano_pair(seed=5)
    sift = R.SIFT_create()
    feats = R.detail.computeImageFeatures(sift, [left, right])
    mi = R.detail.BestOf2NearestMatcher().apply(feats[0], feats[1])
    # warp right into left's frame via the estimated H (translation)
    dx = int(round(-mi.H[0, 2]))
    corners = [(0, 0), (dx, 0)]
    sizes = [(left.shape[1], left.shape[0]),
             (right.shape[1], right.shape[0])]
    masks = [np.full(left.shape[:2], 255, np.uint8),
             np.full(right.shape[:2], 255, np.uint8)]
    seams = R.detail.VoronoiSeamFinder().find([left, right], corners,
                                              masks)
    b = R.detail.MultiBandBlender(num_bands=4)
    b.prepare(corners, sizes)
    b.feed(left, seams[0], corners[0])
    b.feed(right, seams[1], corners[1])
    out, mask = b.blend()
    assert out.shape[1] >= base.shape[1] - 2
    h = min(out.shape[0], base.shape[0])
    w = min(out.shape[1], base.shape[1])
    err = np.abs(out[:h, 5:w - 5].astype(int)
                 - base[:h, 5:w - 5].astype(int)).mean()
    assert err < 10.0, err

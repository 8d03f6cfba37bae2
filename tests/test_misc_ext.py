"""Round-3b misc batch: ellipse fit variants, EDT with labels,
convertMaps, drawMarker — vs cv2 5.0."""

import numpy as np
import pytest

from rustcv_tpu.ops import shape, viz, warp
from rustcv_tpu.ops.ccl import distance_transform_l2_with_labels

cv2 = pytest.importorskip("cv2")


def _ellipse_pts(rng, arc=2 * np.pi, noise=0.3):
    t = rng.uniform(0, arc, 80)
    a, b, cx, cy, th = 40.0, 22.0, 100.0, 80.0, 0.5
    x = cx + a * np.cos(t) * np.cos(th) - b * np.sin(t) * np.sin(th)
    y = cy + a * np.cos(t) * np.sin(th) + b * np.sin(t) * np.cos(th)
    return (np.stack([x, y], 1)
            + rng.normal(0, noise, (80, 2))).astype(np.float32)


@pytest.mark.parametrize("fit,cvfit", [
    (shape.fit_ellipse_direct, "fitEllipseDirect"),
    (shape.fit_ellipse_ams, "fitEllipseAMS"),
])
def test_ellipse_variants_vs_cv2(fit, cvfit):
    pts = _ellipse_pts(np.random.default_rng(3))
    (cx, cy), (d1, d2), ang = fit(pts)
    (rx, ry), (rd1, rd2), rang = getattr(cv2, cvfit)(pts)
    assert abs(cx - rx) < 0.5 and abs(cy - ry) < 0.5
    assert abs(max(d1, d2) - max(rd1, rd2)) < 1.0
    assert abs(min(d1, d2) - min(rd1, rd2)) < 1.0
    # we return the MAJOR-axis angle; cv2's RotatedRect angle belongs
    # to its first axis — normalize both to the major axis
    rmaj = rang if rd1 >= rd2 else (rang + 90.0) % 180.0
    assert min(abs(ang - rmaj), 180 - abs(ang - rmaj)) < 2.0


def test_ellipse_variants_on_arc():
    # a 140° arc — the case the constrained fits exist for
    pts = _ellipse_pts(np.random.default_rng(3), arc=2.4, noise=0.15)
    for fit in (shape.fit_ellipse_direct, shape.fit_ellipse_ams):
        (cx, cy), (d1, d2), _ = fit(pts)
        assert abs(cx - 100) < 6 and abs(cy - 80) < 6
        assert abs(max(d1, d2) - 80) < 12


def test_distance_transform_with_labels():
    m = np.ones((10, 14), np.uint8)
    m[2, 3] = 0
    m[7, 10] = 0
    m[8, 10] = 0  # two-pixel zero component
    dist, labels = distance_transform_l2_with_labels(m)
    # distances: exact L2 vs brute force
    zs = [(2, 3), (7, 10), (8, 10)]
    for y in range(10):
        for x in range(14):
            d = min(np.hypot(y - zy, x - zx) for zy, zx in zs)
            assert abs(dist[y, x] - d) < 1e-5
    # labels partition by nearest zero COMPONENT (two components)
    assert labels[2, 3] != labels[7, 10]
    assert labels[7, 10] == labels[8, 10]
    assert labels[0, 0] == labels[2, 3]
    assert labels[9, 13] == labels[7, 10]
    # cross-check the partition against cv2 — NOTE cv2's WithLabels
    # variant uses the 3×3 chamfer approximation even when asked for
    # DIST_MASK_PRECISE (measured: 2.1969 where √5 = 2.2360), so the
    # distances are compared loosely and the partition modulo its
    # equidistant frontier
    rd, rl = cv2.distanceTransformWithLabels(
        m, cv2.DIST_L2, cv2.DIST_MASK_PRECISE,
        labelType=cv2.DIST_LABEL_CCOMP)
    np.testing.assert_allclose(dist, rd, atol=0.25)
    agree = 0
    for val in np.unique(rl):
        ours_vals, counts = np.unique(labels[rl == val],
                                      return_counts=True)
        agree += counts.max()
    assert agree / labels.size > 0.95


def test_convert_maps_vs_cv2(rng):
    mx, my = np.meshgrid(np.linspace(0, 9, 10, dtype=np.float32),
                         np.linspace(0, 7, 8, dtype=np.float32))
    mx = mx + rng.random((8, 10)).astype(np.float32)
    my = my * 0.9 + rng.random((8, 10)).astype(np.float32)
    m1, m2 = warp.convert_maps(mx, my)
    r1, r2 = cv2.convertMaps(mx, my, cv2.CV_16SC2)
    np.testing.assert_array_equal(m1, r1)
    np.testing.assert_array_equal(m2, r2)


def test_draw_marker(rng):
    img = rng.integers(0, 256, (50, 60), np.uint8)
    gray3 = np.stack([img] * 3, -1)
    for mt in viz._MARKERS:
        out = viz.draw_marker(img, (30, 25), (0, 0, 255), mt, 16)
        changed = (out != gray3).any(-1)
        assert changed.any(), mt
        assert (out[changed] == [0, 0, 255]).all(), mt
    with pytest.raises(ValueError):
        viz.draw_marker(img, (30, 25), (0, 0, 255), "nope")


def test_phase_correlate_iterative(rng):
    from rustcv_tpu.ops.registration import (
        phase_correlate_iterative,
        phase_correlate_numpy,
    )

    base = cv2.GaussianBlur(rng.random((96, 128)).astype(np.float32),
                            (7, 7), 2.0)
    true = np.array([3.3, -1.7])
    m = np.float32([[1, 0, true[0]], [0, 1, true[1]]])
    moved = cv2.warpAffine(base, m, (128, 96))
    s1, _ = phase_correlate_numpy(base.astype(np.float64),
                                  moved.astype(np.float64))
    s2, resp = phase_correlate_iterative(base, moved)
    err1 = np.hypot(*(s1 - true))
    err2 = np.hypot(*(s2 - true))
    assert err2 < err1, (err1, err2)  # refinement helps
    assert err2 < 0.2
    assert resp > 0.1


def test_build_optical_flow_pyramid(rng):
    from rustcv_tpu.ops.optflow import build_optical_flow_pyramid

    g = rng.integers(0, 256, (64, 96), np.uint8)
    pyr = build_optical_flow_pyramid(g, levels=3)
    assert len(pyr) == 3
    assert pyr[0].shape == (64, 96) and pyr[2].shape == (16, 24)


def test_knn_index_exact(rng):
    from rustcv_tpu.ops import core_ops as co
    from rustcv_tpu.ops.knn_index import KnnIndex, radius_search

    data = rng.normal(0, 1, (300, 8)).astype(np.float32)
    queries = rng.normal(0, 1, (20, 8)).astype(np.float32)
    index = KnnIndex(data)
    idx, d2 = index.knn_search(queries, k=4)
    # exactness vs brute force
    bd, bidx = co.batch_distance(queries, data, k=4, norm="l2")
    np.testing.assert_array_equal(idx, bidx)
    np.testing.assert_allclose(np.sqrt(d2), bd, rtol=1e-5)
    # cv2 flann agreement (exact data, kdtree algorithm)
    fl = cv2.flann_Index(data, dict(algorithm=1, trees=4))
    fidx, fd = fl.knnSearch(queries, 4, params=dict(checks=64))
    agree = (fidx == idx).mean()
    assert agree > 0.9, agree  # FLANN is approximate; ours is exact
    # radius search
    ids, dd = radius_search(index, queries[0], radius=float(d2[0, 2]))
    assert len(ids) >= 3 and (dd <= d2[0, 2] + 1e-6).all()


def test_fit_line_robust_vs_outliers():
    from rustcv_tpu.ops.shape import fit_line

    rng = np.random.default_rng(4)
    t = np.linspace(0, 50, 60)
    pts = np.stack([t, 0.5 * t + 3], 1) + rng.normal(0, 0.2, (60, 2))
    pts_out = np.concatenate([pts, [[10, 60], [20, 70], [30, 80]]])
    vx, vy, x0, y0 = fit_line(pts_out, "l2")
    slope_l2 = vy / vx
    vx, vy, x0, y0 = fit_line(pts_out, "huber")
    slope_h = vy / vx
    assert abs(slope_h - 0.5) < 0.02
    assert abs(slope_h - 0.5) < abs(slope_l2 - 0.5)
    # cross-check vs cv2's robust fit
    ref = cv2.fitLine(pts_out.astype(np.float32), cv2.DIST_HUBER,
                      0, 0.01, 0.01).ravel()
    ref_slope = ref[1] / ref[0]
    assert abs(slope_h - ref_slope) < 0.03
    # welsch / l1 / fair also reject the outliers
    for dt in ("welsch", "l1", "fair", "l12"):
        vx, vy, _, _ = fit_line(pts_out, dt)
        assert abs(vy / vx - 0.5) < 0.04, dt


def test_min_enclosing_triangle_vs_cv2():
    from rustcv_tpu.ops.shape import min_enclosing_triangle

    rng = np.random.default_rng(11)
    for _ in range(8):
        pts = rng.normal(0, 10, (12, 2)).astype(np.float32) + 50
        area, tri = min_enclosing_triangle(pts)
        ref_area, ref_tri = cv2.minEnclosingTriangle(
            pts.reshape(-1, 1, 2))
        assert area <= float(ref_area) * (1 + 1e-5), (area, ref_area)
        assert area >= float(ref_area) * (1 - 1e-5)
        # containment of every input point
        for q in pts:
            assert cv2.pointPolygonTest(
                tri.astype(np.float32), (float(q[0]), float(q[1])),
                True) >= -1e-3

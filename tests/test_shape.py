"""Contour geometry utilities — brute-force property checks (hull
containment, min-rect optimality vs angle sweep, DP tolerance bound,
enclosing-circle minimality)."""

import numpy as np
import pytest

from rustcv_tpu.ops import shape


@pytest.fixture
def cloud():
    return np.random.default_rng(0).uniform(0, 100, (60, 2))


class TestBasics:
    def test_contour_area_square(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        assert shape.contour_area(sq) == 100.0
        assert shape.contour_area(sq[::-1]) == 100.0
        assert shape.contour_area(sq, oriented=True) == -shape.contour_area(
            sq[::-1], oriented=True)

    def test_arc_length(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        assert shape.arc_length(sq, closed=True) == 40.0
        assert shape.arc_length(sq, closed=False) == 30.0
        assert shape.arc_length(sq[:1]) == 0.0

    def test_bounding_rect(self):
        pts = np.array([[3, 7], [9, 2], [5, 11]])
        assert shape.bounding_rect(pts) == (3, 2, 7, 10)
        assert shape.bounding_rect(np.empty((0, 2))) == (0, 0, 0, 0)


class TestConvexHull:
    def test_contains_all_points(self, cloud):
        hull = shape.convex_hull(cloud)
        # every point inside or on the hull: all cross products >= 0 (CCW)
        n = len(hull)
        for q in cloud:
            for i in range(n):
                a, b = hull[i], hull[(i + 1) % n]
                cr = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
                assert cr >= -1e-9

    def test_hull_points_are_input_points(self, cloud):
        hull = shape.convex_hull(cloud)
        for hp in hull:
            assert np.min(np.abs(cloud - hp).sum(axis=1)) < 1e-12

    def test_clockwise_flag(self, cloud):
        ccw = shape.convex_hull(cloud)
        cw = shape.convex_hull(cloud, clockwise=True)
        assert np.allclose(ccw, cw[::-1])

    def test_degenerate(self):
        assert len(shape.convex_hull(np.array([[1.0, 2.0]]))) == 1
        col = np.stack([np.arange(5.0), np.arange(5.0)], axis=-1)
        h = shape.convex_hull(col)
        assert len(h) <= 2 or shape.contour_area(h) < 1e-9


class TestMinAreaRect:
    def test_axis_aligned_square(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        (cx, cy), (w, h), ang = shape.min_area_rect(sq)
        assert (cx, cy) == (5.0, 5.0)
        assert sorted([w, h]) == [10.0, 10.0]

    def test_rotated_rect_recovered(self):
        th = np.radians(30)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        base = np.array([[0, 0], [20, 0], [20, 8], [0, 8]], float) @ R.T
        (cx, cy), (w, h), ang = shape.min_area_rect(base + 50)
        assert abs(w * h - 160) < 1e-6
        assert abs(ang % 90 - 30) < 1e-6 or abs(ang % 90 - 60) < 1e-6

    def test_beats_angle_sweep(self, cloud):
        """The calipers area must match the best over a fine angle sweep."""
        (_, _), (w, h), _ = shape.min_area_rect(cloud)
        area = w * h
        best = np.inf
        for th in np.linspace(0, np.pi / 2, 721):
            c, s = np.cos(th), np.sin(th)
            r = cloud @ np.array([[c, -s], [s, c]])
            a = np.ptp(r[:, 0]) * np.ptp(r[:, 1])
            best = min(best, a)
        assert area <= best + 1e-6


class TestApproxPolyDP:
    def test_square_with_jitter_collapses(self):
        # a square traced with 1-px-deviation intermediate points
        edges = []
        for a, b in [((0, 0), (30, 0)), ((30, 0), (30, 30)),
                     ((30, 30), (0, 30)), ((0, 30), (0, 0))]:
            for t in np.linspace(0, 1, 16, endpoint=False):
                p = (1 - t) * np.array(a, float) + t * np.array(b, float)
                p += np.random.default_rng(int(t * 100)).uniform(-0.8, 0.8, 2)
                edges.append(p)
        out = shape.approx_poly_dp(np.asarray(edges), epsilon=2.5, closed=True)
        assert len(out) <= 8  # ~4 corners survive

    def test_open_polyline_endpoints_kept(self):
        p = np.array([[0, 0], [5, 0.1], [10, 0], [10, 10]], float)
        out = shape.approx_poly_dp(p, epsilon=1.0, closed=False)
        assert np.allclose(out[0], p[0]) and np.allclose(out[-1], p[-1])
        assert len(out) == 3  # the 0.1 bump drops, the corner stays

    def test_deviation_bound(self, cloud):
        """Every dropped point lies within epsilon of some chord LINE of
        the simplified polyline (DP measures perpendicular chord
        distance, not clamped segment distance)."""
        eps = 5.0
        out = shape.approx_poly_dp(cloud, epsilon=eps, closed=False)

        def line_dist(q, a, b):
            ab = b - a
            ln = np.hypot(*ab)
            if ln < 1e-12:
                return np.hypot(*(q - a))
            return abs(ab[0] * (q[1] - a[1]) - ab[1] * (q[0] - a[0])) / ln

        for q in cloud:
            d = min(line_dist(q, out[i], out[i + 1]) for i in range(len(out) - 1))
            assert d <= eps + 1e-9


class TestMinEnclosingCircle:
    def test_contains_all(self, cloud):
        (cx, cy), r = shape.min_enclosing_circle(cloud)
        d = np.hypot(cloud[:, 0] - cx, cloud[:, 1] - cy)
        assert d.max() <= r + 1e-6

    def test_minimal(self, cloud):
        (cx, cy), r = shape.min_enclosing_circle(cloud)
        # at least two points must lie on the boundary of a minimal circle
        d = np.hypot(cloud[:, 0] - cx, cloud[:, 1] - cy)
        assert np.sum(d > r - 1e-6) >= 2

    def test_two_points(self):
        (cx, cy), r = shape.min_enclosing_circle(np.array([[0, 0], [10, 0]], float))
        assert (cx, cy, r) == (5.0, 0.0, 5.0)

    def test_known_triangle(self):
        tri = np.array([[0, 0], [10, 0], [5, 5]], float)
        (cx, cy), r = shape.min_enclosing_circle(tri)
        assert abs(cx - 5) < 1e-9 and abs(r - 5) < 1e-6

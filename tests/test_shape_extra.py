"""boxPoints / convex-polygon intersection / rotatedRectangleIntersection
/ EMD / getGaborKernel — exact geometric and transport-problem checks."""

import numpy as np
import pytest

from rustcv_tpu.ops.emd import emd
from rustcv_tpu.ops.shape import (box_points, contour_area,
                                  intersect_convex_convex, min_area_rect,
                                  rotated_rectangle_intersection)


class TestBoxPoints:
    def test_axis_aligned(self):
        pts = box_points(((10.0, 20.0), (6.0, 4.0), 0.0))
        assert pts.shape == (4, 2)
        assert sorted(map(tuple, pts)) == [(7.0, 18.0), (7.0, 22.0),
                                           (13.0, 18.0), (13.0, 22.0)]

    def test_round_trip_min_area_rect(self):
        rect = ((50.0, 40.0), (30.0, 18.0), 25.0)
        pts = box_points(rect)
        (cx, cy), (w, h), ang = min_area_rect(pts)
        assert abs(cx - 50) < 1e-9 and abs(cy - 40) < 1e-9
        assert sorted([round(w, 6), round(h, 6)]) == [18.0, 30.0]
        assert min(abs(ang - 25.0), abs(ang - 115.0) % 90) < 1e-6

    def test_area_preserved(self):
        pts = box_points(((0.0, 0.0), (5.0, 3.0), 77.0))
        assert abs(abs(contour_area(pts, oriented=True)) - 15.0) < 1e-9


class TestConvexIntersection:
    def test_identical_squares(self):
        q = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float64)
        area, pts = intersect_convex_convex(q, q)
        assert abs(area - 16.0) < 1e-9

    def test_offset_squares(self):
        a = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float64)
        b = a + [2, 2]
        area, pts = intersect_convex_convex(a, b)
        assert abs(area - 4.0) < 1e-9
        assert len(pts) == 4

    def test_disjoint(self):
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
        b = a + [5, 5]
        area, pts = intersect_convex_convex(a, b)
        assert area == 0.0 and len(pts) == 0

    def test_triangle_in_square(self):
        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
        tr = np.array([[2, 2], [5, 8], [8, 2]], np.float64)
        area, _ = intersect_convex_convex(tr, sq)
        assert abs(area - abs(contour_area(tr, oriented=True))) < 1e-9

    def test_winding_independent(self):
        a = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float64)
        b = np.array([[2, -1], [6, -1], [6, 3], [2, 3]], np.float64)
        a1, _ = intersect_convex_convex(a, b)
        a2, _ = intersect_convex_convex(a[::-1], b[::-1])
        assert abs(a1 - a2) < 1e-12 and abs(a1 - 6.0) < 1e-9


class TestRotatedRectIntersection:
    def test_full_containment(self):
        big = ((0.0, 0.0), (10.0, 10.0), 0.0)
        small = ((0.0, 0.0), (2.0, 2.0), 30.0)
        status, pts = rotated_rectangle_intersection(big, small)
        assert status == 2
        area = abs(contour_area(pts, oriented=True))
        assert abs(area - 4.0) < 1e-9

    def test_partial(self):
        r1 = ((0.0, 0.0), (4.0, 4.0), 0.0)
        r2 = ((3.0, 0.0), (4.0, 4.0), 45.0)
        status, pts = rotated_rectangle_intersection(r1, r2)
        assert status == 1 and len(pts) >= 3

    def test_none(self):
        r1 = ((0.0, 0.0), (2.0, 2.0), 10.0)
        r2 = ((50.0, 50.0), (2.0, 2.0), 70.0)
        status, pts = rotated_rectangle_intersection(r1, r2)
        assert status == 0 and len(pts) == 0

    def test_cross_area_exact(self):
        # two unit-width crossing bars: intersection is a w×w square
        r1 = ((0.0, 0.0), (10.0, 1.0), 0.0)
        r2 = ((0.0, 0.0), (1.0, 10.0), 0.0)
        status, pts = rotated_rectangle_intersection(r1, r2)
        assert status == 1
        assert abs(abs(contour_area(pts, oriented=True)) - 1.0) < 1e-9


class TestEMD:
    def test_identical_signatures_zero(self):
        s = np.array([[1.0, 0.0], [2.0, 3.0], [0.5, 7.0]])
        assert emd(s, s) < 1e-12

    def test_simple_shift(self):
        # all mass moves distance 2
        s1 = np.array([[1.0, 0.0]])
        s2 = np.array([[1.0, 2.0]])
        assert abs(emd(s1, s2) - 2.0) < 1e-12

    def test_split_transport_exact(self):
        # 1 unit at x=0 → 0.5 at x=1 and 0.5 at x=3: cost 0.5·1+0.5·3=2
        s1 = np.array([[1.0, 0.0]])
        s2 = np.array([[0.5, 1.0], [0.5, 3.0]])
        assert abs(emd(s1, s2) - 2.0) < 1e-12

    def test_crossing_is_suboptimal(self):
        # optimal assignment must NOT cross: 0→1, 10→9 (cost 1), not
        # 0→9, 10→1 (cost 9)
        s1 = np.array([[1.0, 0.0], [1.0, 10.0]])
        s2 = np.array([[1.0, 1.0], [1.0, 9.0]])
        assert abs(emd(s1, s2) - 1.0) < 1e-12

    def test_unbalanced_normalizes_by_smaller_total(self):
        s1 = np.array([[2.0, 0.0]])
        s2 = np.array([[1.0, 5.0]])
        assert abs(emd(s1, s2) - 5.0) < 1e-12

    def test_l1_vs_l2_on_2d(self):
        s1 = np.array([[1.0, 0.0, 0.0]])
        s2 = np.array([[1.0, 3.0, 4.0]])
        assert abs(emd(s1, s2, dist="l2") - 5.0) < 1e-12
        assert abs(emd(s1, s2, dist="l1") - 7.0) < 1e-12

    def test_flow_matrix_is_consistent(self):
        rng = np.random.default_rng(0)
        s1 = np.column_stack([rng.uniform(0.1, 1, 5), rng.uniform(0, 9, 5)])
        s2 = np.column_stack([rng.uniform(0.1, 1, 6), rng.uniform(0, 9, 6)])
        val, flow = emd(s1, s2, return_flow=True)
        need = min(s1[:, 0].sum(), s2[:, 0].sum())
        assert abs(flow.sum() - need) < 1e-9
        assert (flow >= -1e-12).all()
        assert (flow.sum(1) <= s1[:, 0] + 1e-9).all()
        assert (flow.sum(0) <= s2[:, 0] + 1e-9).all()
        c = np.abs(s1[:, 1][:, None] - s2[:, 1][None, :])
        assert abs((flow * c).sum() / need - val) < 1e-9

    def test_matches_bruteforce_lp(self):
        # tiny instances: compare against brute-force enumeration over
        # vertex solutions via itertools assignment relaxation
        rng = np.random.default_rng(3)
        for _ in range(5):
            s1 = np.column_stack([np.ones(3), rng.uniform(0, 10, 3)])
            s2 = np.column_stack([np.ones(3), rng.uniform(0, 10, 3)])
            # equal unit weights → optimal = min-cost perfect matching
            from itertools import permutations

            c = np.abs(s1[:, 1][:, None] - s2[:, 1][None, :])
            best = min(sum(c[i, p[i]] for i in range(3))
                       for p in permutations(range(3)))
            assert abs(emd(s1, s2) - best / 3.0) < 1e-9

    def test_user_cost_matrix(self):
        s1 = np.array([[1.0], [1.0]])
        s2 = np.array([[1.0], [1.0]])
        cost = np.array([[0.0, 10.0], [10.0, 0.0]])
        assert abs(emd(s1, s2, cost=cost)) < 1e-12

    def test_bad_args(self):
        with pytest.raises(ValueError):
            emd(np.array([[-1.0, 0.0]]), np.array([[1.0, 0.0]]))
        with pytest.raises(ValueError):
            emd(np.array([[0.0, 0.0]]), np.array([[1.0, 0.0]]))


class TestGaborKernel:
    def test_shape_and_peak(self):
        from rustcv_tpu import imgproc as ip

        k = ip.get_gabor_kernel((21, 21), sigma=4.0, theta=0.0,
                                lambd=10.0, gamma=0.5, psi=0.0)
        assert k.shape == (21, 21)
        # psi=0, center x'=0 → cos(0)=1 at the center, the max
        assert k[10, 10] == k.max() == 1.0

    def test_theta_rotates(self):
        from rustcv_tpu import imgproc as ip

        k0 = ip.get_gabor_kernel((21, 21), 4.0, 0.0, 10.0, 0.5, psi=0.0)
        k90 = ip.get_gabor_kernel((21, 21), 4.0, np.pi / 2, 10.0, 0.5,
                                  psi=0.0)
        np.testing.assert_allclose(k90, k0.T, atol=1e-12)

    def test_auto_size(self):
        from rustcv_tpu import imgproc as ip

        k = ip.get_gabor_kernel((-1, -1), sigma=2.0, theta=0.0,
                                lambd=6.0, gamma=1.0)
        assert k.shape[0] % 2 == 1 and k.shape[1] % 2 == 1
        assert k.shape[0] >= 13

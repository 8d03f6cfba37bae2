"""Drawing wave 2 (ellipse / fill_poly / arrowed_line / draw_contours)
+ apply_color_map / normalize / accumulate_weighted + contour geometry
(point_polygon_test / is_contour_convex / convexity_defects).

Fidelity: fill_poly device vs golden is BIT-EXACT (pure-integer spec);
ellipse paints the host-computed frozen f64 mask on both paths (identical
bytes by construction); normalize device f32 vs f64 oracle ±1 LSB.
"""

import numpy as np
import pytest

from rustcv_tpu.core.mat import Mat
from rustcv_tpu.imgproc import Point, Scalar
from rustcv_tpu import imgproc
from rustcv_tpu.ops import golden


def _both_paths(draw_fn, h=32, w=40):
    """Run an in-place draw on a host Mat and a device Mat; return both
    results as numpy."""
    base = np.zeros((h, w, 3), np.uint8)
    mh = Mat.from_array(base.copy())
    draw_fn(mh)
    md = Mat.from_array(base.copy())
    md.device()  # push to device
    draw_fn(md)
    return mh.to_numpy(), md.to_numpy()


class TestEllipse:
    def test_host_device_identical(self, jax_cpu):
        host, dev = _both_paths(
            lambda m: imgproc.ellipse(m, Point(20, 16), (14, 7), 30.0,
                                      Scalar.new(255, 0, 0), 2)
        )
        np.testing.assert_array_equal(host, dev)
        assert host[:, :, 0].sum() > 0

    def test_filled_matches_mask(self, jax_cpu):
        mask = golden.ellipse_mask(32, 40, (20, 16), (10, 5), 0.0, -1)
        host, dev = _both_paths(
            lambda m: imgproc.ellipse(m, Point(20, 16), (10, 5), 0.0,
                                      Scalar.new(0, 0, 255), -1)
        )
        np.testing.assert_array_equal(host, dev)
        np.testing.assert_array_equal(host[:, :, 2] == 255, mask > 0)

    def test_axis_aligned_geometry(self):
        # a=10, b=5 at angle 0: (10,0) offset inside, (0,10) offset outside
        m = golden.ellipse_mask(40, 60, (30, 20), (10, 5), 0.0, -1)
        assert m[20, 40] > 0 and m[20, 30] > 0
        assert m[30, 30] == 0  # 10 below center > semi-minor 5
        # rotate 90°: roles swap
        m90 = golden.ellipse_mask(40, 60, (30, 20), (10, 5), 90.0, -1)
        assert m90[30, 30] > 0 and m90[20, 40] == 0


class TestFillPoly:
    def test_device_bit_exact(self, jax_cpu):
        pts = [(3, 3), (36, 5), (20, 28), (5, 20)]
        host, dev = _both_paths(
            lambda m: imgproc.fill_poly(m, pts, Scalar.new(0, 255, 0))
        )
        np.testing.assert_array_equal(host, dev)
        mask = golden.fill_poly_mask(32, 40, pts)
        np.testing.assert_array_equal(host[:, :, 1] == 255, mask > 0)

    def test_concave_and_selfintersecting(self, jax_cpu):
        # concave arrowhead: the notch must stay unfilled
        pts = [(5, 5), (35, 16), (5, 27), (15, 16)]
        m = golden.fill_poly_mask(32, 40, pts)
        assert m[16, 8] == 0  # inside the notch
        assert m[16, 25] > 0
        # even-odd rule: between the bowtie lobes (off the strokes — the
        # exact crossing point itself is boundary, which IS painted)
        bow = [(2, 2), (30, 26), (30, 2), (2, 26)]
        mb = golden.fill_poly_mask(32, 40, bow)
        assert mb[10, 16] == 0
        assert mb[14, 5] > 0 and mb[14, 27] > 0  # the two lobes

    def test_needs_three_vertices(self):
        with pytest.raises(ValueError):
            golden.fill_poly_mask(10, 10, [(1, 1), (5, 5)])


class TestArrowedContours:
    def test_arrowed_line_paths_match(self, jax_cpu):
        host, dev = _both_paths(
            lambda m: imgproc.arrowed_line(m, Point(4, 28), Point(34, 6),
                                           Scalar.all(200), 1)
        )
        np.testing.assert_array_equal(host, dev)
        # head strokes add pixels beyond the bare shaft
        shaft, _ = _both_paths(
            lambda m: imgproc.line(m, Point(4, 28), Point(34, 6),
                                   Scalar.all(200), 1)
        )
        assert (host > 0).sum() > (shaft > 0).sum()

    def test_draw_contours_outline_and_fill(self, jax_cpu):
        cs = [np.array([(3, 3), (18, 3), (18, 14), (3, 14)]),
              np.array([(22, 18), (36, 20), (28, 29)])]
        host, dev = _both_paths(
            lambda m: imgproc.draw_contours(m, cs, -1, Scalar.new(255, 0, 0), 1)
        )
        np.testing.assert_array_equal(host, dev)
        hostf, devf = _both_paths(
            lambda m: imgproc.draw_contours(m, cs, 1, Scalar.new(255, 0, 0), -1)
        )
        np.testing.assert_array_equal(hostf, devf)
        # filled triangle covers its interior; rectangle (idx 0) untouched
        assert hostf[22, 28, 0] == 255
        assert hostf[8, 10, 0] == 0


class TestColorMapNormalize:
    def test_colormap_tables_frozen(self):
        for name in golden.COLORMAP_ANCHORS:
            t = golden.colormap_table(name)
            assert t.shape == (256, 3) and t.dtype == np.uint8
        jet = golden.colormap_table("jet")
        # BGR order: entry 255 is dark red
        assert jet[255, 2] == 128 and jet[255, 0] == 0
        with pytest.raises(ValueError):
            golden.colormap_table("plasma9")

    def test_apply_color_map_paths_agree(self, rng, jax_cpu):
        g = rng.integers(0, 256, (24, 32, 1), np.uint8)
        host = imgproc.apply_color_map(Mat.from_array(g), "hot").to_numpy()
        md = Mat.from_array(g)
        md.device()
        dev = imgproc.apply_color_map(md, "hot").to_numpy()
        np.testing.assert_array_equal(host, dev)  # LUT apply is exact
        table = golden.colormap_table("hot")
        np.testing.assert_array_equal(host, table[g[..., 0]])

    def test_normalize_minmax(self, rng, jax_cpu):
        img = rng.integers(40, 200, (16, 20, 1), np.uint8)
        host = imgproc.normalize(Mat.from_array(img)).to_numpy()
        assert host.min() == 0 and host.max() == 255
        md = Mat.from_array(img)
        md.device()
        dev = imgproc.normalize(md).to_numpy()
        diff = np.abs(host.astype(int) - dev.astype(int))
        assert diff.max() <= 1  # device f32 vs f64 oracle
        flat = imgproc.normalize(Mat.from_array(np.full((4, 4, 1), 9, np.uint8)),
                                 alpha=7.0).to_numpy()
        assert (flat == 7).all()

    def test_normalize_l2(self, rng):
        img = rng.integers(0, 256, (8, 8, 1), np.uint8)
        out = golden.normalize_u8(img, alpha=100.0, kind="l2")
        n = np.linalg.norm(img.astype(np.float64))
        exp = np.clip(np.floor(img / n * 100.0 + 0.5), 0, 255)
        np.testing.assert_array_equal(out, exp.astype(np.uint8))

    def test_accumulate_weighted(self, rng, jax_cpu):
        a = rng.integers(0, 256, (12, 16, 3), np.uint8)
        b = rng.integers(0, 256, (12, 16, 3), np.uint8)
        acc = imgproc.accumulate_weighted(None, Mat.from_array(a), 0.3)
        acc = imgproc.accumulate_weighted(acc, Mat.from_array(b), 0.3)
        exp = 0.7 * a.astype(np.float32) + 0.3 * b.astype(np.float32)
        np.testing.assert_allclose(acc, exp, rtol=1e-6)
        md = Mat.from_array(b)
        md.device()
        dacc = imgproc.accumulate_weighted(None, md, 0.3)
        dacc = np.asarray(imgproc.accumulate_weighted(
            dacc, Mat.from_device(md.device()), 0.3))
        np.testing.assert_allclose(dacc, b.astype(np.float32), rtol=1e-6)


class TestContourGeometry:
    def test_point_polygon_test(self):
        sq = [(0, 0), (10, 0), (10, 10), (0, 10)]
        assert imgproc.point_polygon_test(sq, (5, 5)) == 1.0
        assert imgproc.point_polygon_test(sq, (15, 5)) == -1.0
        assert imgproc.point_polygon_test(sq, (10, 5)) == 0.0
        assert imgproc.point_polygon_test(sq, (5, 5), True) == 5.0
        assert imgproc.point_polygon_test(sq, (13, 5), True) == -3.0

    def test_is_contour_convex(self):
        assert imgproc.is_contour_convex([(0, 0), (10, 0), (10, 10), (0, 10)])
        assert not imgproc.is_contour_convex(
            [(0, 0), (10, 0), (5, 3), (10, 10), (0, 10)])
        # self-intersecting star winds twice — not convex even though
        # every turn has the same sign
        assert not imgproc.is_contour_convex(
            [(0, 0), (4, 10), (8, 0), (0, 6), (8, 6)])
        assert not imgproc.is_contour_convex([(0, 0), (5, 5)])

    def test_convexity_defects(self):
        hand = np.array([(0, 0), (2, 8), (4, 1), (6, 8), (8, 0),
                         (8, 10), (0, 10)])
        hidx = imgproc.convex_hull_indices(hand)
        d = imgproc.convexity_defects(hand, hidx)
        assert d.shape[1] == 4 and len(d) >= 1
        # deepest defect is the valley at index 1 or 3, depth 8 px = 2048
        assert d[:, 3].max() == 8 * 256
        convex = np.array([(0, 0), (10, 0), (10, 10), (0, 10)])
        dc = imgproc.convexity_defects(convex,
                                       imgproc.convex_hull_indices(convex))
        assert len(dc) == 0

    def test_hull_indices_point_back(self):
        pts = np.array([(1, 1), (9, 2), (5, 5), (8, 9), (0, 8)])
        idx = imgproc.convex_hull_indices(pts)
        hull = imgproc.convex_hull(pts)
        np.testing.assert_array_equal(pts[idx].astype(np.float64), hull)

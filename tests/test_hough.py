"""Hough line transform: matmul accumulator vs the classical oracle,
geometric correctness, and the Canny → Hough flow."""

import numpy as np
import pytest

from rustcv_tpu.ops import hough


def _line_mask(h, w, segments):
    m = np.zeros((h, w), np.uint8)
    for (y0, x0, y1, x1) in segments:
        n = max(abs(y1 - y0), abs(x1 - x0)) + 1
        ys = np.linspace(y0, y1, n).round().astype(int)
        xs = np.linspace(x0, x1, n).round().astype(int)
        m[ys, xs] = 255
    return m


class TestHough:
    def test_axis_aligned_lines_exact(self, jax_cpu):
        edges = _line_mask(120, 160, [(30, 10, 30, 149), (10, 80, 109, 80)])
        lines, valid, votes = hough.hough_lines(edges, threshold=50, max_lines=8)
        got = {
            (round(float(r), 1), round(np.degrees(float(t)), 1), int(v))
            for (r, t), ok, v in zip(
                np.asarray(lines), np.asarray(valid), np.asarray(votes)
            )
            if ok
        }
        assert (30.0, 90.0, 140) in got
        assert (80.0, 0.0, 100) in got

    def test_device_matches_oracle(self, jax_cpu, rng):
        edges = _line_mask(
            100, 140, [(20, 5, 80, 120), (90, 10, 10, 130), (50, 0, 50, 139)]
        )
        noise = (rng.random((100, 140)) > 0.99).astype(np.uint8) * 255
        edges = np.maximum(edges, noise)
        lines, valid, votes = hough.hough_lines(edges, threshold=40, max_lines=16)
        ol, ov = hough.hough_lines_numpy(edges, threshold=40, max_lines=16)
        dev = sorted(
            (round(float(r), 3), round(float(t), 4), int(v))
            for (r, t), ok, v in zip(
                np.asarray(lines), np.asarray(valid), np.asarray(votes)
            )
            if ok
        )
        ora = sorted(
            (round(float(r), 3), round(float(t), 4), int(v))
            for (r, t), v in zip(ol, ov)
        )
        assert dev == ora

    def test_diagonal_line_angle(self, jax_cpu):
        """45° line: theta ≈ 135° (normal direction), rho ≈ distance."""
        edges = _line_mask(100, 100, [(10, 10, 90, 90)])
        lines, valid, _ = hough.hough_lines(edges, threshold=40, max_lines=4)
        (r, t) = np.asarray(lines)[np.asarray(valid)][0]
        assert abs(np.degrees(t) - 135.0) < 2.0
        assert abs(r) < 3.0  # y=x passes near the origin

    def test_empty_mask_no_lines(self, jax_cpu):
        _, valid, _ = hough.hough_lines(np.zeros((64, 64), np.uint8), threshold=10)
        assert not np.asarray(valid).any()

    def test_canny_to_hough_flow(self, jax_cpu):
        """The natural pipeline: bright bar → Canny edges → its two long
        border lines found by Hough."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = np.zeros((120, 160), np.uint8)
        img[40:60, 10:150] = 220  # horizontal bar
        edges = imgproc.canny(Mat.from_array(np.repeat(img[..., None], 3, -1)))
        lines = imgproc.hough_lines(edges, threshold=60, max_lines=8)
        assert len(lines) >= 2
        horiz = [r for r, t in lines if abs(np.degrees(t) - 90) < 2]
        assert any(abs(r - 40) < 3 for r in horiz)
        assert any(abs(r - 59) < 3 for r in horiz)


class TestHoughLinesP:
    def test_two_segments_same_line(self, jax_cpu):
        """Two collinear segments separated by a gap > max_line_gap must
        come back as TWO segments with endpoints near the truth."""
        from rustcv_tpu.ops import hough as _hough

        e = np.zeros((80, 120), np.uint8)
        e[40, 10:50] = 255   # segment A: x 10..49
        e[40, 70:110] = 255  # segment B: x 70..109
        segs = _hough.hough_lines_p(
            e, threshold=30, min_line_length=20, max_line_gap=5
        )
        assert segs.shape[0] == 2
        spans = sorted((min(x1, x2), max(x1, x2)) for x1, y1, x2, y2 in segs)
        assert abs(spans[0][0] - 10) <= 1 and abs(spans[0][1] - 49) <= 1
        assert abs(spans[1][0] - 70) <= 1 and abs(spans[1][1] - 109) <= 1
        assert all(y1 == 40 and y2 == 40 for _x1, y1, _x2, y2 in segs)

    def test_min_length_filters(self, jax_cpu):
        from rustcv_tpu.ops import hough as _hough

        e = np.zeros((60, 100), np.uint8)
        e[20, 10:90] = 255  # long
        e[45, 30:40] = 255  # short (10 px)
        segs = _hough.hough_lines_p(
            e, threshold=8, min_line_length=30, max_line_gap=3
        )
        assert segs.shape[0] == 1
        assert segs[0][1] == 20 and segs[0][3] == 20

    def test_diagonal_segment(self, jax_cpu):
        from rustcv_tpu.ops import hough as _hough

        e = np.zeros((80, 80), np.uint8)
        for i in range(15, 65):
            e[i, i] = 255
        segs = _hough.hough_lines_p(
            e, threshold=30, min_line_length=30, max_line_gap=4
        )
        assert segs.shape[0] >= 1
        x1, y1, x2, y2 = segs[0]
        length = np.hypot(int(x2) - int(x1), int(y2) - int(y1))
        assert length >= 45  # ~50·√2 ≈ 70 for the full diagonal... at least most
        assert abs(int(x1) - int(y1)) <= 2 and abs(int(x2) - int(y2)) <= 2

    def test_empty_mask(self, jax_cpu):
        from rustcv_tpu.ops import hough as _hough

        segs = _hough.hough_lines_p(np.zeros((32, 32), np.uint8))
        assert segs.shape == (0, 4)

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core import Mat

        e = np.zeros((64, 96), np.uint8)
        e[30, 8:88] = 255
        segs = imgproc.hough_lines_p(Mat.from_array(e), threshold=30,
                                     min_line_length=40)
        assert segs.shape[0] == 1

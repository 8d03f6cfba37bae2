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

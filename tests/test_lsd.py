"""Line segment detector: synthetic scenes with known geometry, merge
behavior, thresholds, determinism, and the precomputed-edges path."""

import numpy as np

from rustcv_tpu.ops.lsd import detect_line_segments


def _scene():
    """Dark rectangle + bright diagonal on gray background."""
    img = np.full((240, 320), 220, np.uint8)
    img[60:180, 80:240] = 60
    return img


def _has_segment(segs, p, q, tol=4.0):
    """Some detected segment approximates the segment p→q (either
    endpoint order)."""
    p = np.asarray(p, float)
    q = np.asarray(q, float)
    for s in segs:
        a, b = s[:2], s[2:]
        if (np.hypot(*(a - p)) < tol and np.hypot(*(b - q)) < tol) or \
           (np.hypot(*(a - q)) < tol and np.hypot(*(b - p)) < tol):
            return True
    return False


class TestDetection:
    def test_rectangle_edges_found(self):
        segs = detect_line_segments(_scene(), length_threshold=50)
        assert len(segs) >= 4
        # all four rectangle sides present (Canny edge sits within ±2 px
        # of the step; corners erode a few px)
        assert _has_segment(segs, (80, 60), (239, 60), tol=8)
        assert _has_segment(segs, (80, 179), (239, 179), tol=8)
        assert _has_segment(segs, (80, 60), (80, 179), tol=8)
        assert _has_segment(segs, (239, 60), (239, 179), tol=8)

    def test_diagonal_line(self):
        img = np.full((200, 200), 200, np.uint8)
        for t in np.linspace(0, 1, 600):
            y = int(round(40 + t * 100))
            x = int(round(30 + t * 140))
            img[y, max(0, x - 1):x + 2] = 40
        segs = detect_line_segments(img, length_threshold=60)
        assert len(segs) >= 1
        # slope of the longest segment ≈ 100/140
        lens = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
        s = segs[np.argmax(lens)]
        slope = (s[3] - s[1]) / (s[2] - s[0])
        assert abs(abs(slope) - 100 / 140) < 0.08

    def test_length_threshold(self):
        segs = detect_line_segments(_scene(), length_threshold=200)
        lens = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
        assert (lens >= 200).all()

    def test_blank_image(self):
        segs = detect_line_segments(np.full((64, 64), 128, np.uint8))
        assert segs.shape == (0, 4)

    def test_deterministic(self):
        a = detect_line_segments(_scene())
        b = detect_line_segments(_scene())
        np.testing.assert_array_equal(a, b)


class TestMerge:
    def test_merge_rejoins_broken_line(self):
        # a horizontal line with a 3-px gap: unmerged → 2 segments,
        # merged → 1 spanning segment
        img = np.full((100, 300), 210, np.uint8)
        img[50, 20:140] = 30
        img[50, 143:280] = 30
        raw = detect_line_segments(img, length_threshold=30)
        merged = detect_line_segments(img, length_threshold=30,
                                      do_merge=True, merge_gap=8.0)
        assert len(merged) < len(raw) or len(raw) <= 2
        lens = np.hypot(merged[:, 2] - merged[:, 0],
                        merged[:, 3] - merged[:, 1])
        assert lens.max() > 230


class TestEdgesShortCircuit:
    def test_precomputed_edges_match_internal(self):
        from rustcv_tpu.ops import golden

        img = _scene()
        edges = golden.canny(img, low=40, high=90)
        a = detect_line_segments(img)
        b = detect_line_segments(None, edges=edges)
        np.testing.assert_array_equal(a, b)


class TestFacade:
    def test_mat_input(self):
        from rustcv_tpu import imgproc as ip
        from rustcv_tpu.core import Mat

        bgr = np.repeat(_scene()[:, :, None], 3, axis=2)
        segs = ip.detect_line_segments(Mat.from_array(bgr),
                                       length_threshold=50)
        assert len(segs) >= 4

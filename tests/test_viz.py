"""Visualization helpers: clipLine/ellipse2Poly vs cv2, keypoint/match
canvases structural."""

import numpy as np
import pytest

from rustcv_tpu.ops import viz

cv2 = pytest.importorskip("cv2")


def test_clip_line_vs_cv2(rng):
    rect = (0, 0, 100, 80)
    for _ in range(300):
        p1 = tuple(int(v) for v in rng.integers(-60, 160, 2))
        p2 = tuple(int(v) for v in rng.integers(-60, 160, 2))
        ok_r, q1_r, q2_r = cv2.clipLine(rect, p1, p2)
        ok, q1, q2 = viz.clip_line(rect, p1, p2)
        assert ok == ok_r, (p1, p2)
        if ok:
            assert q1 == tuple(q1_r) and q2 == tuple(q2_r), (p1, p2)


def test_clip_line_inside_passthrough():
    ok, p1, p2 = viz.clip_line((0, 0, 50, 50), (3, 4), (40, 45))
    assert ok and p1 == (3, 4) and p2 == (40, 45)


def test_ellipse2poly_vs_cv2():
    for center, axes, ang, a0, a1, d in [
        ((50, 40), (20, 10), 30, 0, 360, 90),
        ((10, 10), (15, 15), 0, 0, 180, 10),
        ((0, 0), (30, 12), 75, 45, 300, 5),
    ]:
        ours = viz.ellipse2poly(center, axes, ang, a0, a1, d)
        ref = cv2.ellipse2Poly(center, axes, ang, a0, a1, d)
        assert len(ours) == len(ref)
        assert np.abs(ours - ref).max() <= 1


def test_draw_keypoints(rng):
    img = rng.integers(0, 256, (60, 80), np.uint8)
    kp = np.array([[20.0, 30.0, 12.0, 45.0], [60.0, 10.0, 8.0, 180.0]])
    out = viz.draw_keypoints(img, kp, rich=True)
    assert out.shape == (60, 80, 3)
    gray3 = np.stack([img] * 3, -1)
    assert (out != gray3).any()
    # deterministic colors from the pinned RNG
    out2 = viz.draw_keypoints(img, kp, rich=True)
    np.testing.assert_array_equal(out, out2)
    # fixed color paints with exactly that color
    outc = viz.draw_keypoints(img, kp, color=(0, 255, 0))
    changed = (outc != gray3).any(-1)
    assert (outc[changed] == [0, 255, 0]).all()


def test_draw_matches(rng):
    a = rng.integers(0, 256, (40, 50), np.uint8)
    b = rng.integers(0, 256, (48, 60), np.uint8)
    k1 = np.array([[10.0, 12.0], [30.0, 20.0]])
    k2 = np.array([[15.0, 30.0], [40.0, 8.0]])
    out = viz.draw_matches(a, k1, b, k2, [(0, 1), (1, 0)])
    assert out.shape == (48, 110, 3)
    # the connecting strokes cross the seam column region
    seam = out[:, 48:52]
    assert (seam != 0).any()

"""TrackerMIL: tracks known motion, survives appearance change and
brief occlusion, deterministic; compared against cv2.TrackerMIL on the
same scene."""

import numpy as np
import pytest

from rustcv_tpu.ops.mil import TrackerMIL

cv2 = pytest.importorskip("cv2")


def _scene(n_frames=12, size=(120, 160), start=(40, 50), vel=(2, 3),
           seed=3, fade=0.0):
    h, w = size
    rng = np.random.default_rng(seed)
    bg = rng.integers(20, 60, (h, w)).astype(np.uint8)
    tex = rng.integers(120, 255, (32, 32)).astype(np.uint8)
    frames, centers = [], []
    cy, cx = start
    for t in range(n_frames):
        f = bg.copy()
        y0, x0 = cy - 16, cx - 16
        patch = np.clip(tex.astype(float) * (1.0 - fade * t), 0,
                        255).astype(np.uint8)
        f[y0:y0 + 32, x0:x0 + 32] = patch
        frames.append(f)
        centers.append((cy, cx))
        cy, cx = cy + vel[0], cx + vel[1]
    return frames, centers


def test_tracks_constant_velocity():
    frames, centers = _scene()
    cy, cx = centers[0]
    tr = TrackerMIL()
    tr.init(frames[0], (cx - 16, cy - 16, 32, 32))
    for t in range(1, len(frames)):
        ok, (x, y, w, h) = tr.update(frames[t])
        ey, ex = centers[t]
        assert abs(x + 16 - ex) <= 3 and abs(y + 16 - ey) <= 3, t
    assert ok


def test_adapts_to_appearance_change():
    frames, centers = _scene(fade=0.04)
    cy, cx = centers[0]
    tr = TrackerMIL()
    tr.init(frames[0], (cx - 16, cy - 16, 32, 32))
    for t in range(1, len(frames)):
        _, (x, y, _, _) = tr.update(frames[t])
        ey, ex = centers[t]
        assert abs(x + 16 - ex) <= 4 and abs(y + 16 - ey) <= 4, t


def test_deterministic():
    frames, centers = _scene(n_frames=6)
    cy, cx = centers[0]
    boxes = []
    for _ in range(2):
        tr = TrackerMIL()
        tr.init(frames[0], (cx - 16, cy - 16, 32, 32))
        boxes.append([tr.update(f)[1] for f in frames[1:]])
    assert boxes[0] == boxes[1]


def test_comparable_to_cv2():
    frames, centers = _scene(n_frames=10)
    cy, cx = centers[0]
    tr = TrackerMIL()
    tr.init(frames[0], (cx - 16, cy - 16, 32, 32))
    ref = cv2.TrackerMIL.create()
    ref.init(np.stack([frames[0]] * 3, -1), (cx - 16, cy - 16, 32, 32))
    ours_err = theirs_err = 0.0
    for t in range(1, len(frames)):
        _, (x, y, _, _) = tr.update(frames[t])
        okr, (xr, yr, _, _) = ref.update(np.stack([frames[t]] * 3, -1))
        ey, ex = centers[t]
        ours_err += abs(x + 16 - ex) + abs(y + 16 - ey)
        theirs_err += abs(xr + 16 - ex) + abs(yr + 16 - ey)
    # within 2× of cv2's tracking error on the same scene (+2px slack)
    assert ours_err <= 2.0 * theirs_err + 2 * (len(frames) - 1)

"""DSST scale estimator: tracks a zooming target's size."""

import numpy as np
import pytest

from rustcv_tpu.ops.dsst_scale import ScaleEstimator

cv2 = pytest.importorskip("cv2")


def _zoom_frames(n=10, growth=1.03, size=(140, 180)):
    rng = np.random.default_rng(3)
    tex = rng.integers(40, 255, (64, 64)).astype(np.uint8)
    frames, sizes = [], []
    for i in range(n):
        s = growth ** i
        side = int(round(32 * s))
        patch = cv2.resize(tex, (side, side),
                           interpolation=cv2.INTER_LINEAR)
        f = np.full(size, 30, np.uint8)
        y0 = 70 - side // 2
        x0 = 90 - side // 2
        f[y0:y0 + side, x0:x0 + side] = patch
        frames.append(f)
        sizes.append(side)
    return frames, sizes


def test_tracks_growth():
    frames, sizes = _zoom_frames()
    est = ScaleEstimator(frames[0], (90, 70), (sizes[0], sizes[0]))
    for i in range(1, len(frames)):
        est.update(frames[i], (90, 70))
        true_scale = sizes[i] / sizes[0]
        assert abs(est.scale - true_scale) / true_scale < 0.06, i
    assert est.scale > 1.15  # net growth detected


def test_tracks_shrink():
    frames, sizes = _zoom_frames(growth=0.97)
    est = ScaleEstimator(frames[0], (90, 70), (sizes[0], sizes[0]))
    for i in range(1, len(frames)):
        est.update(frames[i], (90, 70))
    true_scale = sizes[-1] / sizes[0]
    assert abs(est.scale - true_scale) / true_scale < 0.08
    assert est.scale < 0.9


def test_static_target_stays_unit():
    frames, sizes = _zoom_frames(growth=1.0, n=6)
    est = ScaleEstimator(frames[0], (90, 70), (sizes[0], sizes[0]))
    for f in frames[1:]:
        est.update(f, (90, 70))
    assert abs(est.scale - 1.0) < 0.03

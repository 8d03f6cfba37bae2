"""ColorChecker detection + CCM color calibration end to end."""

import numpy as np
import pytest

from rustcv_tpu.ops import colorchecker as cc
from rustcv_tpu.ops.core_ops import apply_ccm

cv2 = pytest.importorskip("cv2")


def _render_chart(cast=None, shape=(300, 420), tilt=False):
    """Chart with a dark frame, white separators and the 24 reference
    patches; optional channel cast (3, 3) in linear RGB."""
    img = np.full((*shape, 3), 190, np.uint8)
    x0, y0, cw, chh, sep, frame = 60, 50, 48, 44, 6, 10
    w_total = 6 * cw + 7 * sep
    h_total = 4 * chh + 5 * sep
    img[y0 - frame:y0 + h_total + frame,
        x0 - frame:x0 + w_total + frame] = 20
    img[y0:y0 + h_total, x0:x0 + w_total] = 250
    colors = cc.REFERENCE_SRGB.copy()
    if cast is not None:
        colors = np.clip((colors / 255.0) @ np.asarray(cast).T, 0,
                         1) * 255.0
    for r in range(4):
        for c in range(6):
            y = y0 + sep + r * (chh + sep)
            x = x0 + sep + c * (cw + sep)
            rgb = colors[r * 6 + c]
            img[y:y + chh, x:x + cw] = rgb[::-1]  # BGR
    if tilt:
        m = cv2.getRotationMatrix2D((210, 150), 4.0, 0.95)
        img = cv2.warpAffine(img, m, shape[::-1],
                             borderValue=(190, 190, 190))
    return img


def test_detects_and_samples_patches():
    img = _render_chart()
    out = cc.detect_color_checker(img)
    assert out is not None
    corners, colors = out
    assert corners.shape == (4, 2)
    ref_bgr = cc.REFERENCE_SRGB[:, ::-1]
    err = np.abs(colors - ref_bgr)
    assert np.median(err) < 6, np.median(err)


def test_detects_under_rotation():
    img = _render_chart(tilt=True)
    out = cc.detect_color_checker(img)
    assert out is not None
    _, colors = out
    err = np.abs(colors - cc.REFERENCE_SRGB[:, ::-1])
    assert np.median(err) < 12


def test_ccm_corrects_cast():
    cast = np.array([[0.85, 0.1, 0.0], [0.05, 0.8, 0.05],
                     [0.0, 0.1, 0.95]])
    img = _render_chart(cast=cast)
    out = cc.detect_color_checker(img)
    assert out is not None
    _, colors = out
    m = cc.color_checker_ccm(colors)
    # applying the CCM to the cast patch colors recovers the reference
    src_rgb = np.asarray(colors)[:, ::-1] / 255.0
    corrected = apply_ccm(src_rgb.reshape(4, 6, 3), m).reshape(-1, 3)
    err = np.abs(corrected * 255.0 - cc.REFERENCE_SRGB)
    assert np.median(err) < 5, np.median(err)


def test_no_chart_returns_none(rng):
    img = rng.integers(120, 250, (200, 300, 3), np.uint8)
    assert cc.detect_color_checker(img) is None

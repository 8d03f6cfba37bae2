"""Contrast-preserving decolorization."""

import numpy as np
import pytest

from rustcv_tpu.ops import decolor as dc

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def iso_scene():
    # red/green patches with similar luminance — plain gray flattens
    img = np.zeros((60, 80, 3), np.uint8)
    img[:, :40] = (30, 30, 200)
    img[:, 40:] = (30, 160, 30)
    return cv2.GaussianBlur(img, (5, 5), 2)


def test_preserves_isoluminant_contrast(iso_scene):
    gray, _ = dc.decolor(iso_scene)
    plain = cv2.cvtColor(iso_scene, cv2.COLOR_BGR2GRAY)
    ours_seam = abs(int(gray[30, 20]) - int(gray[30, 60]))
    plain_seam = abs(int(plain[30, 20]) - int(plain[30, 60]))
    assert ours_seam > 4 * plain_seam, (ours_seam, plain_seam)


def test_natural_image_sane(rng):
    img = rng.integers(0, 256, (48, 64, 3), np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    gray, boost = dc.decolor(img)
    assert gray.shape == (48, 64) and gray.dtype == np.uint8
    assert boost.shape == img.shape and boost.dtype == np.uint8
    # on generic scenes the result still correlates with luminance
    # (loosely — the optimal contrast mapping reweights channels)
    plain = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(float)
    corr = np.corrcoef(gray.ravel().astype(float), plain.ravel())[0, 1]
    assert abs(corr) > 0.4
    # contrast-preservation metric at least as good as plain gray
    ours = dc.contrast_preservation(gray, img)
    base = dc.contrast_preservation(plain, img)
    assert ours > base - 0.05


def test_deterministic(iso_scene):
    g1, b1 = dc.decolor(iso_scene)
    g2, b2 = dc.decolor(iso_scene)
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(b1, b2)

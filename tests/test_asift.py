"""ASIFT (AffineFeature role): survives strong viewpoint tilt where
plain SIFT matching collapses."""

import numpy as np
import pytest

from rustcv_tpu.ops.asift import affine_detect_and_compute
from rustcv_tpu.ops.sift import detect_and_compute, match_descriptors_l2

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tilted_pair():
    rng = np.random.default_rng(7)
    img = np.zeros((160, 200), np.uint8)
    # textured blobs
    for _ in range(40):
        y, x = rng.integers(15, 145), rng.integers(15, 185)
        r = rng.integers(3, 9)
        v = rng.integers(60, 255)
        cv2.circle(img, (int(x), int(y)), int(r), int(v), -1)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    # strong out-of-plane tilt: compress x to 45%
    m = np.float32([[0.45, 0.05, 20], [0.02, 0.95, 5]])
    tilted = cv2.warpAffine(img, m, (200, 160))
    return img, tilted, m


def _inlier_rate(kp1, d1, kp2, d2, m, thresh=4.0):
    if len(kp1) == 0 or len(kp2) == 0:
        return 0.0, 0
    matches = match_descriptors_l2(d1, d2, ratio=0.8)
    if len(matches) == 0:
        return 0.0, 0
    src = kp1[matches[:, 0], :2]
    dst = kp2[matches[:, 1], :2]
    pred = src @ m[:, :2].T + m[:, 2]
    ok = np.linalg.norm(pred - dst, axis=1) < thresh
    return float(ok.mean()), int(ok.sum())


def test_asift_beats_sift_under_tilt(tilted_pair):
    img, tilted, m = tilted_pair
    kp1, d1 = detect_and_compute(img)
    kp2, d2 = detect_and_compute(tilted)
    _, sift_inl = _inlier_rate(kp1, d1, kp2, d2, m)

    ak1, ad1 = affine_detect_and_compute(img)
    ak2, ad2 = affine_detect_and_compute(tilted)
    rate, asift_inl = _inlier_rate(ak1, ad1, ak2, ad2, m)
    # ASIFT must find substantially more geometric inliers
    assert asift_inl >= max(8, 2 * sift_inl), (sift_inl, asift_inl)
    assert rate > 0.3


def test_keypoints_in_original_frame(tilted_pair):
    img, _, _ = tilted_pair
    kp, desc = affine_detect_and_compute(img)
    assert len(kp) > 50 and len(kp) == len(desc)
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < 200).all()
    assert (kp[:, 1] >= 0).all() and (kp[:, 1] < 160).all()

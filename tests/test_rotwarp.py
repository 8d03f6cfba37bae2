"""Rotation warpers vs cv2.PyRotationWarper."""

import numpy as np
import pytest

from rustcv_tpu.ops.rotwarp import RotationWarper

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def scene():
    img = np.zeros((100, 140, 3), np.uint8)
    img[::10] = 255
    img[:, ::10] = 128
    k = np.array([[100.0, 0, 70], [0, 100.0, 50], [0, 0, 1]],
                 np.float32)
    return img, k


@pytest.mark.parametrize("kind,min_corr", [
    ("plane", 0.999), ("cylindrical", 0.95), ("spherical", 0.95)])
def test_vs_cv2(scene, kind, min_corr):
    img, k = scene
    r = np.eye(3, dtype=np.float32)
    c_ref, ref = cv2.PyRotationWarper(kind, 100.0).warp(
        img, k, r, cv2.INTER_LINEAR, cv2.BORDER_CONSTANT)
    c_our, ours = RotationWarper(kind, 100.0).warp(img, k, r)
    assert abs(c_our[0] - c_ref[0]) <= 1 and abs(c_our[1]
                                                 - c_ref[1]) <= 1
    dy, dx = c_ref[1] - c_our[1], c_ref[0] - c_our[0]
    oh = min(ours.shape[0], ref.shape[0]) - abs(dy)
    ow = min(ours.shape[1], ref.shape[1]) - abs(dx)
    a = ours[max(dy, 0):max(dy, 0) + oh,
             max(dx, 0):max(dx, 0) + ow, 0].astype(float)
    b = ref[max(-dy, 0):max(-dy, 0) + oh,
            max(-dx, 0):max(-dx, 0) + ow, 0].astype(float)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > min_corr, (kind, corr)


def test_rotated_view(scene):
    img, k = scene
    from rustcv_tpu.ops.calib import rodrigues

    r = rodrigues(np.array([0.0, 0.3, 0.0])).astype(np.float32)
    c_ref, ref = cv2.PyRotationWarper("spherical", 100.0).warp(
        img, k, r, cv2.INTER_LINEAR, cv2.BORDER_CONSTANT)
    c_our, ours = RotationWarper("spherical", 100.0).warp(img, k, r)
    assert abs(c_our[0] - c_ref[0]) <= 2 and abs(c_our[1]
                                                 - c_ref[1]) <= 2

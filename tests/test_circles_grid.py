"""findCirclesGrid: render → detect → verify correspondence, plus a
cross-check against cv2.findCirclesGrid's detected set."""

import numpy as np
import pytest

from rustcv_tpu.ops import circles_grid as cg

cv2 = pytest.importorskip("cv2")


def _render(centers: np.ndarray, radius: float, hmat: np.ndarray,
            shape=(240, 320), noise=2.0, seed=0) -> np.ndarray:
    h, w = shape
    img = np.full(shape, 215.0)
    ones = np.ones((len(centers), 1))
    p = np.concatenate([centers, ones], 1) @ hmat.T
    p = p[:, :2] / p[:, 2:3]
    ys, xs = np.mgrid[0:h, 0:w]
    for (cx, cy) in p:
        d2 = (xs - cx) ** 2 + (ys - cy) ** 2
        img[d2 <= radius * radius] = 35.0
    rng = np.random.default_rng(seed)
    img += rng.normal(0, noise, shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return cv2.GaussianBlur(img, (3, 3), 0.8)


def _h_for(scale, tx, ty, tilt=0.0):
    return np.array([[scale, tilt * scale, tx],
                     [-tilt * scale * 0.5, scale, ty],
                     [1e-4, -8e-5, 1.0]])


def test_symmetric_grid():
    pattern = (5, 4)
    obj = cg.circles_grid_object_points(pattern, 1.0)[:, :2]
    hmat = _h_for(34.0, 70.0, 55.0, tilt=0.08)
    img = _render(obj, 11.0, hmat)
    found, centers = cg.find_circles_grid(img, pattern)
    assert found and centers.shape == (20, 2)
    # correspondence: an orientation-preserving homography from object
    # space must fit with sub-pixel residual
    hfit, resid = cg._fit_homography(obj, centers)
    assert resid < 0.6 and np.linalg.det(hfit[:2, :2]) > 0
    # cross-check the SET of centers against cv2
    rfound, rcent = cv2.findCirclesGrid(
        img, pattern, flags=cv2.CALIB_CB_SYMMETRIC_GRID)
    if rfound:
        ours = centers[np.lexsort(centers.T)]
        ref = rcent.reshape(-1, 2)[np.lexsort(rcent.reshape(-1, 2).T)]
        np.testing.assert_allclose(ours, ref, atol=1.0)


def test_asymmetric_grid():
    pattern = (4, 11)
    obj = cg.circles_grid_object_points(pattern, 1.0, asymmetric=True)
    hmat = _h_for(15.0, 50.0, 30.0, tilt=0.05)
    img = _render(obj[:, :2], 6.0, hmat, shape=(240, 320))
    found, centers = cg.find_circles_grid(img, pattern, asymmetric=True)
    assert found and centers.shape == (44, 2)
    hfit, resid = cg._fit_homography(obj[:, :2], centers)
    assert resid < 0.6 and np.linalg.det(hfit[:2, :2]) > 0
    rfound, rcent = cv2.findCirclesGrid(
        img, pattern, flags=cv2.CALIB_CB_ASYMMETRIC_GRID)
    if rfound:
        ours = centers[np.lexsort(centers.T)]
        ref = rcent.reshape(-1, 2)[np.lexsort(rcent.reshape(-1, 2).T)]
        np.testing.assert_allclose(ours, ref, atol=1.0)


def test_rejects_sparse_and_clutter():
    # too few blobs
    img = np.full((120, 160), 220, np.uint8)
    found, _ = cg.find_circles_grid(img, (4, 3))
    assert not found
    # grid + clutter blobs still detects (outlier rejection)
    pattern = (4, 3)
    obj = cg.circles_grid_object_points(pattern, 1.0)[:, :2]
    hmat = _h_for(30.0, 60.0, 40.0)
    img = _render(obj, 10.0, hmat, shape=(200, 280))
    img = img.copy()
    ys, xs = np.mgrid[0:200, 0:280]
    for (cx, cy) in [(250.0, 30.0), (25.0, 170.0)]:
        img[(xs - cx) ** 2 + (ys - cy) ** 2 <= 81] = 35
    found, centers = cg.find_circles_grid(img, pattern)
    assert found
    _, resid = cg._fit_homography(obj, centers)
    assert resid < 0.6


def test_object_points_convention():
    obj = cg.circles_grid_object_points((4, 5), 2.0, asymmetric=True)
    # OpenCV convention: x = (2c + r%2)·size, y = r·size
    assert obj[0].tolist() == [0.0, 0.0, 0.0]
    assert obj[4].tolist() == [2.0, 2.0, 0.0]   # row 1 starts offset
    assert obj[1].tolist() == [4.0, 0.0, 0.0]

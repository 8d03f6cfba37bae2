"""Corner-response family: f64 oracle vs cv2 5.0 full-frame, device twin
vs oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import corner

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(1234)
    g = rng.integers(0, 256, (48, 64), np.uint8)
    return cv2.GaussianBlur(g, (5, 5), 1.5)


def test_spatial_gradient_vs_cv2(img):
    dx, dy = corner.spatial_gradient_numpy(img)
    rdx, rdy = cv2.spatialGradient(img)
    np.testing.assert_array_equal(dx, rdx)
    np.testing.assert_array_equal(dy, rdy)
    ddx, ddy = corner.spatial_gradient(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(ddx), rdx)
    np.testing.assert_array_equal(np.asarray(ddy), rdy)


@pytest.mark.parametrize("block,ksize", [(3, 3), (5, 3), (3, 5), (5, 5),
                                         (7, 3)])
def test_min_eigen_val_vs_cv2(img, block, ksize):
    ours = corner.corner_min_eigen_val_numpy(img, block, ksize)
    ref = cv2.cornerMinEigenVal(img, block, ksize=ksize)
    np.testing.assert_allclose(ours, ref, atol=2e-6 * max(1, ref.max()))
    dev = np.asarray(corner.corner_min_eigen_val(jnp.asarray(img),
                                                 block, ksize))
    np.testing.assert_allclose(dev, ours, atol=3e-6 * max(1, ref.max()))


def test_eigen_vals_and_vecs_vs_cv2(img):
    ours = corner.corner_eigen_vals_and_vecs_numpy(img, 3, 3)
    ref = cv2.cornerEigenValsAndVecs(img, 3, 3)
    scale = max(1.0, float(np.abs(ref[..., :2]).max()))
    np.testing.assert_allclose(ours[..., 0], ref[..., 0],
                               atol=2e-6 * scale)
    np.testing.assert_allclose(ours[..., 1], ref[..., 1],
                               atol=2e-6 * scale)
    # eigenvectors: compare collinearity where the eigenvalues are
    # well-separated (sign and degenerate direction are arbitrary)
    sep = (ref[..., 0] - ref[..., 1]) > 1e-4 * scale
    for base in (2, 4):
        dot = np.abs(ours[..., base] * ref[..., base]
                     + ours[..., base + 1] * ref[..., base + 1])
        assert dot[sep].min() > 0.999

    dev = np.asarray(corner.corner_eigen_vals_and_vecs(jnp.asarray(img)))
    np.testing.assert_allclose(dev[..., :2], ours[..., :2],
                               atol=3e-6 * scale)


def test_pre_corner_detect_vs_cv2(img):
    ours = corner.pre_corner_detect_numpy(img)
    ref = cv2.preCornerDetect(img, 3)
    scale = max(1e-6, float(np.abs(ref).max()))
    np.testing.assert_allclose(ours, ref, atol=3e-6 * scale)
    dev = np.asarray(corner.pre_corner_detect(jnp.asarray(img)))
    np.testing.assert_allclose(dev, ours, atol=3e-6 * scale)


def test_min_eigen_corner_peak():
    # a synthetic corner: bright quadrant — response peaks at its apex
    img = np.zeros((32, 32), np.uint8)
    img[16:, 16:] = 200
    r = corner.corner_min_eigen_val_numpy(img, 3, 3)
    y, x = np.unravel_index(np.argmax(r), r.shape)
    assert abs(y - 16) <= 1 and abs(x - 16) <= 1

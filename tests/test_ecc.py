"""findTransformECC: recovery of known warps per motion type, device
twin agreement, computeECC, failure semantics."""

import numpy as np
import pytest

from rustcv_tpu.ops import ecc

H, W = 120, 160


def _texture(seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = 128 + 50 * np.sin(xx / 9) * np.cos(yy / 7) + 30 * np.sin(
        (xx + yy) / 13)
    return img + rng.normal(0, 1, img.shape)


def _make_input(template, m):
    """Build I such that I(W(x; m)) == template(x) (up to sampling)."""
    m3 = np.vstack([m, [0, 0, 1]]) if m.shape == (2, 3) else m
    minv = np.linalg.inv(m3)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / d
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / d
    return ecc._sample_np(template, sx, sy)


class TestRecovery:
    def test_translation(self):
        t = _texture()
        true_m = np.array([[1, 0, 3.2], [0, 1, -2.1]], float)
        rho, m = ecc.find_transform_ecc_numpy(t, _make_input(t, true_m),
                                              "translation")
        assert rho > 0.99
        assert np.abs(m[:, 2] - true_m[:, 2]).max() < 0.05

    def test_euclidean(self):
        t = _texture(1)
        th = 0.03
        true_m = np.array([[np.cos(th), -np.sin(th), 2.0],
                           [np.sin(th), np.cos(th), -1.0]])
        rho, m = ecc.find_transform_ecc_numpy(t, _make_input(t, true_m),
                                              "euclidean")
        assert rho > 0.99
        assert np.abs(m[:, :2] - true_m[:, :2]).max() < 0.01
        assert np.abs(m[:, 2] - true_m[:, 2]).max() < 0.3

    def test_affine(self):
        t = _texture(2)
        true_m = np.array([[1.02, 0.03, 2.5], [-0.02, 0.99, -1.7]])
        rho, m = ecc.find_transform_ecc_numpy(t, _make_input(t, true_m),
                                              "affine")
        assert rho > 0.99
        assert np.abs(m[:, :2] - true_m[:, :2]).max() < 0.01
        assert np.abs(m[:, 2] - true_m[:, 2]).max() < 0.4

    def test_homography(self):
        t = _texture(3)
        true_m = np.array([[1.01, 0.02, 1.5], [-0.015, 0.995, 2.0],
                           [1e-5, -2e-5, 1.0]])
        rho, m = ecc.find_transform_ecc_numpy(
            t, _make_input(t, true_m), "homography", iterations=100)
        assert rho > 0.99
        assert np.abs(m - true_m).max() < 0.1

    def test_identity_converges_immediately(self):
        t = _texture(4)
        rho, m = ecc.find_transform_ecc_numpy(t, t, "affine")
        assert rho > 0.9999
        np.testing.assert_allclose(m, np.eye(2, 3), atol=1e-3)

    def test_large_shift_with_initial_guess(self):
        # a 14-px shift: the border band is clamp-smeared garbage, so
        # recovery is biased to ~1 px — assert the warp lands in the
        # right basin and the guess path agrees with the cold start
        t = _texture(5)
        true_m = np.array([[1, 0, 14.0], [0, 1, -11.0]], float)
        img = _make_input(t, true_m)
        guess = np.array([[1, 0, 12.0], [0, 1, -9.0]], float)
        rho, m = ecc.find_transform_ecc_numpy(t, img, "translation",
                                              warp=guess)
        assert rho > 0.9
        assert np.abs(m[:, 2] - true_m[:, 2]).max() < 1.2


class TestDeviceTwin:
    @pytest.mark.parametrize("motion", ["translation", "euclidean",
                                        "affine", "homography"])
    def test_matches_oracle(self, motion, jax_cpu):
        t = _texture(6)
        if motion == "homography":
            true_m = np.array([[1.01, 0.02, 1.5], [-0.01, 0.99, 2.0],
                               [1e-5, -1e-5, 1.0]])
        elif motion == "euclidean":
            th = 0.02
            true_m = np.array([[np.cos(th), -np.sin(th), 1.5],
                               [np.sin(th), np.cos(th), 2.0]])
        elif motion == "affine":
            true_m = np.array([[1.01, 0.02, 1.5], [-0.01, 0.99, 2.0]])
        else:
            true_m = np.array([[1, 0, 1.5], [0, 1, 2.0]], float)
        img = _make_input(t, true_m)
        rho_h, m_h = ecc.find_transform_ecc_numpy(t, img, motion,
                                                  iterations=80)
        rho_d, m_d = ecc.find_transform_ecc(t, img, motion,
                                            iterations=80,
                                            backend="device")
        assert abs(rho_h - rho_d) < 1e-3
        assert np.abs(np.asarray(m_h) - np.asarray(m_d)).max() < 0.05


class TestSemantics:
    def test_compute_ecc(self):
        t = _texture(7)
        assert abs(ecc.compute_ecc(t, t) - 1.0) < 1e-12
        assert abs(ecc.compute_ecc(t, -t) + 1.0) < 1e-12
        rng = np.random.default_rng(0)
        assert abs(ecc.compute_ecc(
            t, rng.normal(size=t.shape))) < 0.1

    def test_uncorrelated_raises(self):
        rng = np.random.default_rng(8)
        a = rng.normal(128, 30, (64, 64))
        b = rng.normal(128, 30, (64, 64))
        with pytest.raises(ValueError):
            ecc.find_transform_ecc_numpy(a, b, "affine")

    def test_device_reports_negative_rho_instead(self, jax_cpu):
        rng = np.random.default_rng(9)
        a = rng.normal(128, 30, (64, 64))
        b = rng.normal(128, 30, (64, 64))
        rho, _ = ecc.find_transform_ecc(a, b, "affine", backend="device")
        assert rho <= 0.2  # no credible alignment claimed

    def test_bad_motion(self):
        with pytest.raises(ValueError):
            ecc.find_transform_ecc_numpy(np.zeros((8, 8)),
                                         np.zeros((8, 8)), "similarity")


def test_multiscale_large_shift():
    import cv2 as _cv2

    from rustcv_tpu.ops.ecc import (
        find_transform_ecc_multiscale,
        find_transform_ecc_numpy,
    )

    rng = np.random.default_rng(5)
    base = _cv2.GaussianBlur(
        rng.integers(0, 256, (120, 160)).astype(np.uint8), (7, 7), 2.0)
    m = np.float32([[1, 0, 14.0], [0, 1, -9.0]])
    moved = _cv2.warpAffine(base, m, (160, 120))
    # single-scale ECC can't bridge a 14px shift from identity
    rho1, w1 = find_transform_ecc_numpy(base, moved, "translation",
                                        iterations=40)
    rho2, w2 = find_transform_ecc_multiscale(base, moved, "translation",
                                             levels=4, iterations=40)
    # rho is depressed by the warp's zero-filled 14px border band; the
    # recovered SHIFT is the real check
    assert rho2 > 0.85
    np.testing.assert_allclose([w2[0, 2], w2[1, 2]], [14.0, -9.0],
                               atol=0.2)
    assert rho2 >= rho1 - 1e-9

"""AKAZE: nonlinear scale space (device twin vs oracle), blob/corner
detection, rotation invariance through descriptor matching, scale
assignment, generic Hamming matcher."""

import numpy as np
import pytest

from rustcv_tpu.ops import akaze


def _scene(seed=0, h=240, w=320):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 128.0)
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx, r, v in [(60, 80, 12, 255), (150, 200, 20, 30),
                         (100, 250, 8, 220), (190, 60, 15, 40)]:
        img = np.where((yy - cy) ** 2 + (xx - cx) ** 2 < r * r, v, img)
    img += 20 * np.sin(xx / 15) * np.cos(yy / 11)
    return np.clip(img + rng.normal(0, 2, img.shape), 0,
                   255).astype(np.uint8)


class TestScaleSpace:
    def test_device_matches_oracle(self, jax_cpu):
        img = _scene().astype(np.float64) / 255.0
        lv_h, plan, k = akaze.build_scale_space(img)
        lv_d, plan_d, k_d = akaze.build_scale_space_device(img)
        assert plan == plan_d and k == k_d
        for a, b in zip(lv_h, lv_d):
            assert np.abs(np.asarray(b, np.float64) - a).max() < 1e-3

    def test_diffusion_preserves_edges_smooths_noise(self):
        rng = np.random.default_rng(1)
        img = np.full((80, 120), 0.2)
        img[:, 60:] = 0.8
        noisy = img + rng.normal(0, 0.02, img.shape)
        levels, plan, _ = akaze.build_scale_space(noisy, n_octaves=1,
                                                  n_sublevels=4)
        last = levels[-1]
        assert last[:, :50].std() < noisy[:, :50].std() * 0.3
        # edge stays at the σ₀ base-blur bound — a LINEAR blur to the
        # same total scale (σ_global of the last level) is much softer
        step = np.abs(np.diff(last.mean(axis=0))).max()
        linear = akaze._gauss_blur(noisy, plan[-1][2])
        step_lin = np.abs(np.diff(linear.mean(axis=0))).max()
        assert step > 1.5 * step_lin
        assert step > 0.12

    def test_octaves_halve(self):
        img = _scene().astype(np.float64) / 255.0
        levels, plan, _ = akaze.build_scale_space(img, n_octaves=3,
                                                  n_sublevels=2)
        assert levels[0].shape == (240, 320)
        assert levels[2].shape == (120, 160)
        assert levels[4].shape == (60, 80)


class TestDetection:
    def test_blobs_found(self):
        kp, desc = akaze.detect_and_compute(_scene())
        assert len(kp) > 20
        assert desc.shape == (len(kp), 64)
        # every seeded blob has a keypoint within its radius
        for cy, cx, r in [(60, 80, 12), (150, 200, 20), (100, 250, 8),
                          (190, 60, 15)]:
            d = np.hypot(kp[:, 0] - cx, kp[:, 1] - cy)
            assert d.min() < r, (cy, cx)

    def test_blob_scale_tracks_radius(self):
        # one blob, two sizes: the bigger blob's best keypoint must
        # carry a larger size
        def one(r):
            img = np.full((160, 160), 200.0)
            yy, xx = np.mgrid[0:160, 0:160]
            img = np.where((yy - 80) ** 2 + (xx - 80) ** 2 < r * r,
                           40.0, img)
            kp, _ = akaze.detect_and_compute(img.astype(np.uint8))
            d = np.hypot(kp[:, 0] - 80, kp[:, 1] - 80)
            near = kp[d < r]
            assert len(near) > 0
            return near[np.argmax(near[:, 4]), 2]
        assert one(20) > one(8)

    def test_device_backend_agrees(self, jax_cpu):
        img = _scene(2)
        kp_h, d_h = akaze.detect_and_compute(img)
        kp_d, d_d = akaze.detect_and_compute(img, backend="device")
        # scale spaces agree to 1e-3 → same detections up to boundary
        # ties; demand ≥90% shared keypoints with equal descriptors
        set_h = {tuple(np.round(k[:2], 1)) for k in kp_h}
        set_d = {tuple(np.round(k[:2], 1)) for k in kp_d}
        inter = len(set_h & set_d)
        assert inter > 0.9 * max(len(set_h), len(set_d))

    def test_blank_image(self):
        kp, desc = akaze.detect_and_compute(
            np.full((64, 64), 128, np.uint8))
        assert len(kp) == 0 and desc.shape == (0, 64)

    def test_deterministic(self):
        img = _scene(3)
        a = akaze.detect_and_compute(img)
        b = akaze.detect_and_compute(img)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestRotationInvariance:
    def test_rot90_matching(self, jax_cpu):
        img = _scene()
        kp1, d1 = akaze.detect_and_compute(img)
        img90 = np.rot90(img, k=-1).copy()
        kp2, d2 = akaze.detect_and_compute(img90)
        m = akaze.match_descriptors_hamming(d1, d2)
        assert len(m) > 30
        hh = img.shape[0]
        good = 0
        for i, j in m:
            x1, y1 = kp1[i][:2]
            x2, y2 = kp2[j][:2]
            if abs((hh - 1 - y1) - x2) < 3 and abs(x1 - y2) < 3:
                good += 1
        assert good > 0.7 * len(m)


class TestHammingMatcher:
    def test_exact_and_crosscheck(self, jax_cpu):
        rng = np.random.default_rng(0)
        d1 = rng.integers(0, 256, (20, 64)).astype(np.uint8)
        noise = (rng.random((20, 64)) < 0.02) * rng.integers(
            0, 256, (20, 64)).astype(np.uint8)
        d2 = (d1 ^ noise)[::-1]  # reversed order, few bit flips
        m = akaze.match_descriptors_hamming(d1, d2, ratio=0.95)
        assert len(m) >= 18
        for i, j in m:
            assert j == 19 - i

    def test_empty(self):
        m = akaze.match_descriptors_hamming(
            np.zeros((0, 64), np.uint8), np.zeros((5, 64), np.uint8))
        assert m.shape == (0, 2)

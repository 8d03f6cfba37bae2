"""SIFT: blob scale recovery, rotation/scale invariance of the
descriptors, determinism, device-pyramid parity."""

import numpy as np
import pytest

from rustcv_tpu.ops import sift, warp
from rustcv_tpu.ops.sift import _blur


def _texture(seed=4, shape=(160, 200)):
    rng = np.random.default_rng(seed)
    img = _blur(rng.integers(0, 256, shape).astype(np.float64), 2.5)
    return ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)


class TestDetect:
    def test_blob_positions_and_scale_ratio(self):
        h, w = 128, 160
        img = np.full((h, w), 40.0)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        for cy, cx, s in [(40, 50, 3.0), (80, 110, 6.0)]:
            img += 150 * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2)
                                / (2 * s * s))
        kp, desc = sift.detect_and_compute(
            np.clip(img, 0, 255).astype(np.uint8))
        assert len(kp) and desc.shape[1] == 128 and desc.dtype == np.uint8

        def near(cx, cy):
            d = np.hypot(kp[:, 0] - cx, kp[:, 1] - cy)
            return kp[d < 3.0]

        small, big = near(50, 40), near(110, 80)
        assert len(small) and len(big)
        ratio = np.median(big[:, 2]) / np.median(small[:, 2])
        assert 1.7 < ratio < 2.3  # σ 3 vs 6 blobs

    def test_deterministic(self):
        img = _texture()
        k1, d1 = sift.detect_and_compute(img)
        k2, d2 = sift.detect_and_compute(img)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(d1, d2)

    def test_flat_image_no_keypoints(self):
        kp, desc = sift.detect_and_compute(np.full((64, 64), 128, np.uint8))
        assert len(kp) == 0 and desc.shape == (0, 128)

    def test_n_features_cap(self):
        img = _texture()
        kp, desc = sift.detect_and_compute(img, n_features=10)
        assert len(kp) == 10 == len(desc)
        kall, _ = sift.detect_and_compute(img)
        # capped set = top-10 by response
        assert np.all(kp[:, 4] >= np.sort(kall[:, 4])[-10])


class TestInvariance:
    def test_rotation(self):
        img = _texture()
        m = warp.get_rotation_matrix_2d((100.0, 80.0), 35.0, 1.0)
        rot = warp.warp_affine_numpy(img, m, (200, 160))
        k1, d1 = sift.detect_and_compute(img)
        k2, d2 = sift.detect_and_compute(rot)
        mt = sift.match_descriptors_l2(d1, d2)
        assert len(mt) >= 60
        src, dst = k1[mt[:, 0], :2], k2[mt[:, 1], :2]
        err = np.linalg.norm(src @ m[:, :2].T + m[:, 2] - dst, axis=1)
        assert np.median(err) < 1.0
        assert (err < 2.0).mean() > 0.9

    def test_scale(self):
        img = _texture()
        k1, d1 = sift.detect_and_compute(img)
        k3, d3 = sift.detect_and_compute(img[::2, ::2])
        mt = sift.match_descriptors_l2(d1, d3)
        assert len(mt) >= 60
        err = np.linalg.norm(k1[mt[:, 0], :2] / 2 - k3[mt[:, 1], :2], axis=1)
        assert np.median(err) < 1.0 and (err < 2.0).mean() > 0.9

    def test_keypoint_angle_tracks_rotation(self):
        img = _texture(seed=9)
        m = warp.get_rotation_matrix_2d((100.0, 80.0), 50.0, 1.0)
        rot = warp.warp_affine_numpy(img, m, (200, 160))
        k1, d1 = sift.detect_and_compute(img)
        k2, d2 = sift.detect_and_compute(rot)
        mt = sift.match_descriptors_l2(d1, d2)
        assert len(mt) >= 30
        da = (k2[mt[:, 1], 3] - k1[mt[:, 0], 3]) % 360.0
        da = np.minimum(da, 360.0 - da)  # fold to [0, 180]
        # matched keypoints' reported angles differ by the rotation
        assert abs(np.median(da) - 50.0) < 5.0


class TestDevicePyramid:
    def test_matches_oracle(self, jax_cpu):
        img = _texture(shape=(96, 120))
        gh, dh = sift.build_pyramids(img)
        gd, dd = sift.build_pyramids_device(img)
        assert len(gh) == len(gd)
        for a, b in zip(gh, gd):
            assert np.abs(a - b).max() < 2e-3
        kp_h, desc_h = sift.detect_and_compute(img)
        kp_d, desc_d = sift.detect_and_compute(img, use_device=True)
        # keypoint sets broadly agree (f32 vs f64 pyramids)
        assert abs(len(kp_h) - len(kp_d)) <= max(3, 0.15 * len(kp_h))


class TestMatcher:
    def test_empty_inputs(self):
        z = np.zeros((0, 128), np.uint8)
        assert sift.match_descriptors_l2(z, z).shape == (0, 2)

    def test_ratio_rejects_ambiguous(self):
        a = np.zeros((1, 128)); a[0, 0] = 100
        b = np.stack([a[0], a[0]])  # two identical candidates
        assert len(sift.match_descriptors_l2(a, b)) == 0

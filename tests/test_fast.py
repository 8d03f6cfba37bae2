"""FAST corner detector: device bit-exact vs the frozen oracle, geometric
sanity (square corners), NMS, and the facade."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.ops import fast, golden


class TestFast:
    @pytest.mark.parametrize("threshold,n", [(20, 9), (10, 12), (40, 9)])
    def test_device_bit_exact(self, jax_cpu, threshold, n):
        gray = golden.bgr_to_gray(sim.synth_bgr(160, 120, 5))
        cm, sc = fast.fast_response(gray, threshold=threshold, n=n)
        om, osc = fast.fast_corners_numpy(gray, threshold=threshold, n=n)
        np.testing.assert_array_equal(np.asarray(cm), om)
        np.testing.assert_array_equal(np.asarray(sc), osc)  # pre-NMS masked

    def test_square_corners(self, jax_cpu):
        img = np.zeros((40, 40), np.uint8)
        img[10:30, 10:30] = 200
        cm, _ = fast.fast_response(img, threshold=20)
        ys, xs = np.nonzero(np.asarray(cm))
        assert sorted(zip(ys.tolist(), xs.tolist())) == [
            (10, 10), (10, 29), (29, 10), (29, 29)
        ]

    def test_flat_image_no_corners(self, jax_cpu):
        img = np.full((32, 32), 99, np.uint8)
        cm, _ = fast.fast_response(img)
        assert not np.asarray(cm).any()

    def test_nms_reduces_clusters(self, jax_cpu):
        gray = golden.bgr_to_gray(sim.synth_bgr(160, 120, 5))
        raw, _ = fast.fast_response(gray, nms=False)
        nms, _ = fast.fast_response(gray, nms=True)
        assert np.asarray(nms).sum() <= np.asarray(raw).sum()

    def test_border_never_fires(self, rng, jax_cpu):
        img = rng.integers(0, 256, size=(30, 30), dtype=np.uint8)
        cm, _ = fast.fast_response(img, threshold=5)
        m = np.asarray(cm)
        assert not m[:3].any() and not m[-3:].any()
        assert not m[:, :3].any() and not m[:, -3:].any()

    def test_facade_host_device_agree(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        gray = golden.bgr_to_gray(sim.synth_bgr(160, 120, 5))
        host = imgproc.fast_corners(Mat.from_array(gray), max_corners=32)
        import jax.numpy as jnp

        dev = imgproc.fast_corners(Mat.from_device(jnp.asarray(gray)), max_corners=32)
        assert set(map(tuple, host.tolist())) == set(map(tuple, dev.tolist()))
        # corners seed LK exactly like harris points
        assert host.shape[1] == 2


class TestCornerSubPix:
    def test_relative_subpixel_accuracy(self, jax_cpu):
        """Refinement is guess-independent and tracks sub-pixel corner
        motion to <0.1 px (the absolute apex has a small model-inherent
        offset on blurred L-corners — the DELTA is the contract)."""
        from rustcv_tpu.ops import features, warp

        base = np.zeros((64, 64), np.uint8)
        base[16:48, 16:48] = 200

        def refined(off, guess):
            m = np.array([[1.0, 0.0, off[0]], [0.0, 1.0, off[1]]])
            img = golden.gaussian5_u8(
                warp.warp_affine_numpy(base, m, (64, 64), border="replicate")
            )
            return np.asarray(
                features.corner_sub_pix(
                    img, np.array([guess], np.float32), win=9
                )
            )[0]

        anchor = refined((0.0, 0.0), (16, 16))
        # guess independence
        for g in [(15, 17), (17, 15)]:
            assert np.abs(refined((0.0, 0.0), g) - anchor).max() < 1e-3
        # sub-pixel deltas recovered
        for off in [(0.3, -0.4), (-0.25, 0.1)]:
            delta = refined(off, (16, 16)) - anchor
            assert np.abs(delta - np.array(off)).max() < 0.1

    def test_out_of_window_points_unchanged(self, jax_cpu):
        from rustcv_tpu.ops import features

        img = np.zeros((32, 32), np.uint8)
        pts = np.array([[2.0, 2.0]], np.float32)  # window leaves the image
        out = np.asarray(features.corner_sub_pix(img, pts, win=11))
        np.testing.assert_array_equal(out, pts)

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        gray = golden.bgr_to_gray(sim.synth_bgr(96, 64, 5))
        pts = imgproc.fast_corners(Mat.from_array(gray), threshold=15, max_corners=16)
        if len(pts):
            ref = imgproc.corner_sub_pix(Mat.from_array(gray), pts, win=7)
            assert ref.shape == pts.shape
            assert np.abs(ref - pts).max() <= 7.0

    def test_device_matches_oracle(self, jax_cpu, rng):
        from rustcv_tpu.ops import features

        gray = golden.bgr_to_gray(sim.synth_bgr(120, 90, 5))
        gray = np.clip(
            gray.astype(np.int32) + rng.integers(0, 25, gray.shape), 0, 255
        ).astype(np.uint8)
        pts = np.array(
            [[30.0, 30.0], [60.0, 45.0], [90.0, 60.0], [3.0, 3.0]], np.float32
        )
        dev = np.asarray(features.corner_sub_pix(gray, pts, win=9))
        ora = features.corner_sub_pix_numpy(gray, pts, win=9)
        assert np.abs(dev - ora).max() < 5e-2  # f32 vs f64 iteration drift
        np.testing.assert_array_equal(dev[3], pts[3])  # out-of-window


class TestPatternVariants:
    """FAST 5_8 / 7_12 / 9_16 patterns, cross-validated vs cv2 5.0."""

    @staticmethod
    def _scene():
        import cv2 as _cv2

        r = np.random.default_rng(5)
        return _cv2.GaussianBlur(
            r.integers(0, 256, (60, 70), np.uint8), (3, 3), 1.0)

    def test_916_set_equal_cv2(self):
        cv2 = pytest.importorskip("cv2")
        img = self._scene()
        det = cv2.FastFeatureDetector.create(
            threshold=20, nonmaxSuppression=False,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        ref = {(int(k.pt[1]), int(k.pt[0])) for k in det.detect(img)}
        mask, _ = fast.fast_corners_numpy(img, threshold=20, nms=False)
        ours = {(int(y), int(x)) for y, x in zip(*np.nonzero(mask))}
        assert ours == ref

    @pytest.mark.parametrize("pattern,cvtype_name", [
        ("7_12", "FastFeatureDetector_TYPE_7_12"),
        ("5_8", "FastFeatureDetector_TYPE_5_8"),
    ])
    def test_variant_superset_of_cv2(self, pattern, cvtype_name):
        # cv2 5.0's 7_12 drops wrap-around arcs and its 5_8 requires all
        # 8 ring pixels (black-box probed); the published segment test we
        # implement detects strictly more — every cv2 corner is ours
        cv2 = pytest.importorskip("cv2")
        img = self._scene()
        det = cv2.FastFeatureDetector.create(
            threshold=20, nonmaxSuppression=False,
            type=getattr(cv2, cvtype_name))
        ref = {(int(k.pt[1]), int(k.pt[0])) for k in det.detect(img)}
        mask, _ = fast.fast_corners_numpy(img, threshold=20, nms=False,
                                          pattern=pattern)
        ours = {(int(y), int(x)) for y, x in zip(*np.nonzero(mask))}
        assert ref and ref.issubset(ours)

    @pytest.mark.parametrize("pattern", ["5_8", "7_12"])
    def test_device_matches_oracle(self, pattern, jax_cpu):
        img = self._scene()
        om, osc = fast.fast_corners_numpy(img, threshold=18,
                                          pattern=pattern)
        dm, dsc = fast.fast_response(jnp.asarray(img), threshold=18,
                                     pattern=pattern)
        np.testing.assert_array_equal(np.asarray(dm), om)
        np.testing.assert_array_equal(np.asarray(dsc), osc)

    def test_smaller_ring_fires_near_borders(self):
        img = np.full((20, 20), 50, np.uint8)
        img[2:6, 2:6] = 220
        m58, _ = fast.fast_corners_numpy(img, threshold=30, nms=False,
                                         pattern="5_8")
        m916, _ = fast.fast_corners_numpy(img, threshold=30, nms=False)
        assert m58[:, :3].any() or m58[:3, :].any() or m58.sum() > 0
        # the 8-ring border is 1 px, so rows 1-2 are eligible
        ys, _ = np.nonzero(m58)
        assert len(ys) and ys.min() <= 2

"""RANSAC transform estimation: exact recovery on clean correspondences,
outlier robustness, degenerate handling, and the full stabilization loop
(FAST → BRIEF → match → estimate → warp)."""

import numpy as np
import pytest

from rustcv_tpu.ops import geometry as geo
from rustcv_tpu.ops import golden, warp
from rustcv_tpu.capture import simulation as sim


def _apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


class TestEstimate:
    def test_similarity_exact_recovery(self, rng):
        m_true = warp.get_rotation_matrix_2d((10.0, 5.0), 25.0, 1.3)
        src = rng.uniform(0, 100, (40, 2))
        dst = _apply(m_true, src)
        m, inl = geo.estimate_affine_partial_2d(src, dst)
        assert inl.all()
        np.testing.assert_allclose(m, m_true, atol=1e-9)

    def test_affine_exact_recovery(self, rng):
        m_true = np.array([[1.2, 0.3, 5.0], [-0.1, 0.9, -2.0]])
        src = rng.uniform(0, 100, (40, 2))
        dst = _apply(m_true, src)
        m, inl = geo.estimate_affine_2d(src, dst)
        assert inl.all()
        np.testing.assert_allclose(m, m_true, atol=1e-9)

    def test_outlier_robustness(self, rng):
        m_true = warp.get_rotation_matrix_2d((0.0, 0.0), -10.0, 0.9)
        src = rng.uniform(0, 200, (60, 2))
        dst = _apply(m_true, src)
        bad = rng.choice(60, 20, replace=False)
        dst[bad] += rng.uniform(30, 80, (20, 2))  # gross outliers
        m, inl = geo.estimate_affine_partial_2d(src, dst, ransac_thresh=2.0)
        assert m is not None
        assert inl.sum() >= 38 and not inl[bad].any()
        np.testing.assert_allclose(m, m_true, atol=1e-6)

    def test_degenerate_inputs(self):
        m, inl = geo.estimate_affine_partial_2d([[0, 0]], [[1, 1]])
        assert m is None
        # collinear points cannot fix a full affine
        src = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
        m2, _ = geo.estimate_affine_2d(src, src * 2)
        # either None or a transform that at least maps the line correctly
        if m2 is not None:
            np.testing.assert_allclose(_apply(m2, src), src * 2, atol=1e-6)

    def test_stabilization_loop(self, rng, jax_cpu):
        """End-to-end: detect/describe/match two frames, estimate the
        motion, warp the second frame back — residual shrinks to ~0."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        gray = golden.bgr_to_gray(sim.synth_bgr(160, 120, 3))
        gray = np.clip(
            gray.astype(np.int32) + rng.integers(0, 25, gray.shape), 0, 255
        ).astype(np.uint8)
        m_true = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, -3.0]])
        moved = warp.warp_affine_numpy(gray, m_true, (160, 120), border="replicate")

        m1, m2 = Mat.from_array(gray), Mat.from_array(moved)
        p1 = imgproc.fast_corners(m1, threshold=15, max_corners=64)
        p2 = imgproc.fast_corners(m2, threshold=15, max_corners=64)
        d1, v1 = imgproc.compute_brief(m1, p1)
        d2, v2 = imgproc.compute_brief(m2, p2)
        matches = imgproc.match_descriptors(d1, d2, v1, v2)
        assert len(matches) >= 3
        m_est, inl = imgproc.estimate_affine_partial_2d(
            p1[matches[:, 0]], p2[matches[:, 1]]
        )
        assert m_est is not None and inl.sum() >= 3
        np.testing.assert_allclose(m_est[:, 2], [5.0, -3.0], atol=0.5)
        np.testing.assert_allclose(m_est[:, :2], np.eye(2), atol=0.02)

"""BRIEF descriptors + Hamming matching: device bit-exact vs oracle,
matching invariants, and the full detect→describe→match pipeline."""

import numpy as np
import pytest

from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.ops import brief, golden, warp


@pytest.fixture()
def textured(rng):
    gray = golden.bgr_to_gray(sim.synth_bgr(160, 120, 3))
    return np.clip(
        gray.astype(np.int32) + rng.integers(0, 25, gray.shape), 0, 255
    ).astype(np.uint8)


PTS = np.array(
    [[40.0, 60.0], [80.0, 40.0], [120.0, 80.0], [20.0, 20.0], [5.0, 5.0]],
    np.float32,
)


class TestBrief:
    def test_device_bit_exact(self, jax_cpu, textured):
        d_dev, v_dev = brief.brief_descriptors(textured, PTS)
        d_np, v_np = brief.brief_descriptors_numpy(textured, PTS)
        np.testing.assert_array_equal(np.asarray(d_dev), d_np)
        np.testing.assert_array_equal(np.asarray(v_dev), v_np)
        assert not v_np[4]  # patch leaves the image

    def test_self_match_is_identity(self, jax_cpu, textured):
        d, v = brief.brief_descriptors_numpy(textured, PTS)
        m = brief.match_descriptors(d, d, v, v)
        assert m.tolist() == [[0, 0], [1, 1], [2, 2], [3, 3]]

    def test_matches_across_translation(self, jax_cpu, textured):
        mshift = np.array([[1.0, 0.0, 7.0], [0.0, 1.0, 3.0]])
        nxt = warp.warp_affine_numpy(textured, mshift, (160, 120), border="replicate")
        d1, v1 = brief.brief_descriptors_numpy(textured, PTS)
        d2, v2 = brief.brief_descriptors_numpy(nxt, PTS + np.array([7.0, 3.0], np.float32))
        m = brief.match_descriptors(d1, d2, v1, v2)
        assert m.tolist() == [[0, 0], [1, 1], [2, 2], [3, 3]]

    def test_ratio_test_rejects_ambiguous(self, jax_cpu):
        """Identical descriptors in d2 → top-2 tie → ratio test kills it."""
        d1 = np.zeros((1, 8), np.uint32)
        d1[0, 0] = 0xDEADBEEF
        d2 = np.vstack([d1, d1])  # two identical candidates
        m = brief.match_descriptors(d1, d2, ratio=0.8)
        assert len(m) == 0

    def test_full_pipeline_detect_describe_match(self, jax_cpu, textured):
        """FAST corners → BRIEF → match across a shifted frame: matched
        pairs recover the shift."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        shift = np.array([6.0, 4.0])
        mshift = np.array([[1.0, 0.0, shift[0]], [0.0, 1.0, shift[1]]])
        nxt_img = warp.warp_affine_numpy(
            textured, mshift, (160, 120), border="replicate"
        )
        m1, m2 = Mat.from_array(textured), Mat.from_array(nxt_img)
        p1 = imgproc.fast_corners(m1, threshold=15, max_corners=64)
        p2 = imgproc.fast_corners(m2, threshold=15, max_corners=64)
        assert len(p1) > 5 and len(p2) > 5
        d1, v1 = imgproc.compute_brief(m1, p1)
        d2, v2 = imgproc.compute_brief(m2, p2)
        matches = imgproc.match_descriptors(d1, d2, v1, v2)
        assert len(matches) >= 3
        flows = p2[matches[:, 1]] - p1[matches[:, 0]]
        med = np.median(flows, axis=0)
        assert np.all(np.abs(med - shift) < 1.0)

"""FAST corner detector: device bit-exact vs the frozen oracle, geometric
sanity (square corners), NMS, and the facade."""

import numpy as np
import pytest

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

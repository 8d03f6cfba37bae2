"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile for real TPU — validated in the perf harness)."""

import numpy as np
import pytest

from rustcv_tpu.core import PixelFormat
from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.ops import golden


class TestStencilKernel:
    @pytest.mark.parametrize(
        "shape,tile", [((2, 48, 64), 32), ((1, 100, 130), 32), ((1, 135, 256), 128),
                       ((1, 6, 128), 128), ((3, 64, 200), 32)],
    )
    def test_blur_sobel_parity(self, rng, jax_cpu, shape, tile):
        from rustcv_tpu.ops.pallas.stencil import blur_sobel_mag_pallas

        g = rng.integers(0, 256, shape, dtype=np.uint8)
        want = np.stack(
            [golden.gradient_magnitude_u8(*golden.sobel3_gray(golden.gaussian5_u8(x))) for x in g]
        )
        got = np.asarray(blur_sobel_mag_pallas(jax_cpu.numpy.asarray(g), tile_rows=tile))
        np.testing.assert_array_equal(got, want)

    def test_2d_input(self, rng, jax_cpu):
        from rustcv_tpu.ops.pallas.stencil import blur_sobel_mag_pallas

        g = rng.integers(0, 256, (40, 56), dtype=np.uint8)
        want = golden.gradient_magnitude_u8(*golden.sobel3_gray(golden.gaussian5_u8(g)))
        got = np.asarray(blur_sobel_mag_pallas(jax_cpu.numpy.asarray(g)))
        np.testing.assert_array_equal(got, want)


class TestMegaKernel:
    @pytest.mark.parametrize("w,h,tile", [(64, 48, 16), (128, 96, 32), (64, 50, 16)])
    def test_full_tick_parity(self, jax_cpu, w, h, tile):
        """The complete fused tick (synth→decode→gray→blur→sobel→|∇|→overlay)
        must match the golden chain bit-for-bit."""
        import jax.numpy as jnp

        from rustcv_tpu.ops.pallas.megapipe import (
            fused_capture_pipeline,
            mag_words_to_numpy,
            wordplanes_to_packed_numpy,
        )

        seqs = np.array([0, 7], np.int32)
        rects = np.array([[5, 5, 30, 20], [-3, -3, 10, 10]], np.int32)
        cols = np.array([[9, 99, 199], [255, 0, 0]], np.int32)
        out = fused_capture_pipeline(
            jnp.asarray(seqs), jnp.asarray(rects), jnp.asarray(cols), 2,
            width=w, height=h, tile_rows=tile,
        )
        bgr = wordplanes_to_packed_numpy(np.asarray(out["bgr_wordplanes"]))
        mag = mag_words_to_numpy(np.asarray(out["mag_words"]))
        for k, s in enumerate(seqs):
            raw = sim.synth_raw(w, h, PixelFormat.YUYV, int(s))
            want_bgr = golden.yuyv_to_bgr(raw, w, h)
            gray = golden.bgr_to_gray(want_bgr)
            want_mag = golden.gradient_magnitude_u8(
                *golden.sobel3_gray(golden.gaussian5_u8(gray))
            )
            ov = want_bgr.copy()
            golden.rectangle(
                ov.reshape(h, -1), h, w, w * 3, tuple(rects[k]), tuple(cols[k]), 2
            )
            np.testing.assert_array_equal(mag[k], want_mag, err_msg=f"mag stream {k}")
            np.testing.assert_array_equal(
                bgr[k], ov.reshape(h, w, 3), err_msg=f"bgr stream {k}"
            )

    def test_width_constraint(self, jax_cpu):
        import jax.numpy as jnp

        from rustcv_tpu.ops.pallas.megapipe import fused_capture_pipeline

        with pytest.raises(ValueError):
            fused_capture_pipeline(
                jnp.asarray([0], jnp.int32), jnp.zeros((1, 4), jnp.int32),
                jnp.zeros((1, 3), jnp.int32), 1, width=66, height=48,
            )


class TestStencilV2:
    @pytest.mark.parametrize(
        "shape,tile", [((2, 48, 64), 32), ((1, 135, 256), 128), ((1, 6, 128), 128)],
    )
    def test_auto_pipelined_parity(self, rng, jax_cpu, shape, tile):
        from rustcv_tpu.ops.pallas.stencil_v2 import blur_sobel_mag_pallas_v2

        g = rng.integers(0, 256, shape, dtype=np.uint8)
        want = np.stack(
            [golden.gradient_magnitude_u8(*golden.sobel3_gray(golden.gaussian5_u8(x))) for x in g]
        )
        got = np.asarray(blur_sobel_mag_pallas_v2(jax_cpu.numpy.asarray(g), tile_rows=tile))
        np.testing.assert_array_equal(got, want)

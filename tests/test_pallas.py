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


class TestStencilV3:
    @pytest.mark.parametrize(
        "shape,tile", [((2, 48, 64), 32), ((1, 135, 256), 128), ((1, 6, 128), 128)],
    )
    def test_zero_copy_halo_parity(self, rng, jax_cpu, shape, tile):
        """v3 (overlapping BlockSpec views, no halo gather) must stay
        bit-exact with the golden chain — incl. non-multiple-of-tile heights
        and tiny images."""
        from rustcv_tpu.ops.pallas.stencil_v3 import blur_sobel_mag_pallas_v3

        g = rng.integers(0, 256, shape, dtype=np.uint8)
        want = np.stack(
            [golden.gradient_magnitude_u8(*golden.sobel3_gray(golden.gaussian5_u8(x))) for x in g]
        )
        got = np.asarray(blur_sobel_mag_pallas_v3(jax_cpu.numpy.asarray(g), tile_rows=tile))
        np.testing.assert_array_equal(got, want)

    def test_engine_stencil_impl_variants_agree(self, jax_cpu):
        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.core import PixelFormat, SimpleConfig
        from rustcv_tpu.runtime import MultiStreamEngine

        outs = []
        for impl in ("xla", "pallas", "pallas_v1", "pallas_v2"):
            eng = MultiStreamEngine(
                SimulationDriver(paced=False), 2,
                SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
                filter="blur_sobel", stencil_impl=impl,
            )
            outs.append(np.asarray(eng.tick(block=True).outputs["filtered"]))
            eng.close()
        for o in outs[1:]:
            np.testing.assert_array_equal(o, outs[0])

"""Fused Pallas decode+interleave kernel vs the XLA golden path.

The kernel claims bit-exactness with color.yuyv_to_bgr_packed /
color.yuyv_to_gray / draw.rectangle_packed (ops/pallas/decode_interleave.py);
CI checks it in interpret mode on CPU, probe_parity_tpu.py re-checks the
compiled kernel on the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rustcv_tpu.ops import color as C
from rustcv_tpu.ops import draw as D
from rustcv_tpu.ops.pallas.decode_interleave import (
    _tile_rows,
    yuyv_decode_interleave,
)


@pytest.mark.parametrize("shape", [(96, 48), (128, 40), (256, 96), (130, 64)])
def test_decode_matches_xla(jax_cpu, shape):
    w, h = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    src = jnp.asarray(rng.integers(0, 256, (3, h * w * 2), np.uint8))
    out = yuyv_decode_interleave(src, w, h)
    assert out is not None
    bgr, gray = out
    np.testing.assert_array_equal(
        np.asarray(bgr), np.asarray(C.yuyv_to_bgr_packed(src, w, h)))
    np.testing.assert_array_equal(
        np.asarray(gray), np.asarray(C.yuyv_to_gray(src, w, h)))


def test_overlay_matches_rectangle_packed(jax_cpu):
    w, h = 192, 96
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.integers(0, 256, (4, h * w * 2), np.uint8))
    # includes off-canvas, degenerate, and thick rect cases
    rects = jnp.asarray(
        [[20, 10, 80, 40], [-15, -8, 60, 30], [50, 40, 0, 10],
         [150, 70, 100, 100]], jnp.int32)
    colors = jnp.asarray(rng.integers(0, 256, (4, 3), np.uint8))
    for t in (1, 3):
        ref = D.rectangle_packed(
            C.yuyv_to_bgr_packed(src, w, h), rects, colors, jnp.int32(t))
        bgr, gray = yuyv_decode_interleave(
            src, w, h, rects, colors, jnp.int32(t), overlay=True)
        np.testing.assert_array_equal(np.asarray(bgr), np.asarray(ref))
        # gray is the PRE-overlay frame (filter input semantics)
        np.testing.assert_array_equal(
            np.asarray(gray), np.asarray(C.yuyv_to_gray(src, w, h)))


def test_tile_rows():
    assert _tile_rows(1080) == 120
    assert _tile_rows(2160) == 120
    assert _tile_rows(48) == 48
    assert _tile_rows(96) == 96
    assert _tile_rows(129) == 0  # no 8-divisible tiling → XLA fallback
    assert 2160 % _tile_rows(2160) == 0


@pytest.mark.parametrize("shape", [(96, 48), (130, 64), (256, 384)])
def test_tick_fused_matches_golden_chain(jax_cpu, shape):
    """One-kernel tick (decode+overlay+interleave+stencil): bit-exact vs
    the XLA composition, incl. multi-tile halo rows at (256, 384)."""
    from rustcv_tpu.ops import filters as F
    from rustcv_tpu.ops.pallas.tick_fused import yuyv_tick_fused

    w, h = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    src = jnp.asarray(rng.integers(0, 256, (2, h * w * 2), np.uint8))
    rects = jnp.asarray(rng.integers(-10, 80, (2, 4), np.int32))
    colors = jnp.asarray(rng.integers(0, 256, (2, 3), np.uint8))
    out = yuyv_tick_fused(src, w, h, rects, colors, jnp.int32(2),
                          overlay=True)
    assert out is not None
    bgr, filt = out
    ref_bgr = D.rectangle_packed(
        C.yuyv_to_bgr_packed(src, w, h), rects, colors, jnp.int32(2))
    blurred = F.gaussian5_u8(C.yuyv_to_gray(src, w, h), has_channels=False)
    gx, gy = F.sobel3_gray(blurred)
    ref_filt = F.gradient_magnitude_u8(gx, gy)
    np.testing.assert_array_equal(np.asarray(bgr), np.asarray(ref_bgr))
    np.testing.assert_array_equal(np.asarray(filt), np.asarray(ref_filt))


@pytest.mark.parametrize("impl", ["xla_fused", "pallas", "pallas_tick"])
def test_pipeline_variants_match(jax_cpu, monkeypatch, impl):
    from rustcv_tpu.core.pixel_format import PixelFormat
    from rustcv_tpu.runtime.pipeline import PipelineSpec, _build

    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.integers(0, 256, (2, 48 * 96 * 2), np.uint8))
    rects = jnp.asarray([[10, 10, 40, 20], [5, 8, 30, 25]], jnp.int32)
    cols = jnp.asarray([[0, 255, 0], [255, 0, 0]], jnp.uint8)
    spec = PipelineSpec(PixelFormat.YUYV, 96, 48, filter="blur_sobel",
                        overlay=True, stencil_impl="pallas")
    monkeypatch.setenv("RUSTCV_DECODE", impl)
    got = _build(spec)(raw, rects, cols, jnp.int32(2))
    monkeypatch.setenv("RUSTCV_DECODE", "xla")
    ref = _build(spec)(raw, rects, cols, jnp.int32(2))
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_pipeline_fused_path_matches(jax_cpu, monkeypatch):
    from rustcv_tpu.core.pixel_format import PixelFormat
    from rustcv_tpu.runtime.pipeline import PipelineSpec, _build

    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.integers(0, 256, (2, 48 * 96 * 2), np.uint8))
    rects = jnp.asarray([[10, 10, 40, 20], [5, 8, 30, 25]], jnp.int32)
    cols = jnp.asarray([[0, 255, 0], [255, 0, 0]], jnp.uint8)
    spec = PipelineSpec(PixelFormat.YUYV, 96, 48, filter="blur_sobel",
                        overlay=True, stencil_impl="pallas")
    monkeypatch.setenv("RUSTCV_DECODE", "pallas")
    out_fused = _build(spec)(raw, rects, cols, jnp.int32(2))
    monkeypatch.setenv("RUSTCV_DECODE", "xla")
    out_xla = _build(spec)(raw, rects, cols, jnp.int32(2))
    for k in out_xla:
        np.testing.assert_array_equal(
            np.asarray(out_fused[k]), np.asarray(out_xla[k]), err_msg=k)

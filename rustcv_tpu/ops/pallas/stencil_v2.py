"""Auto-pipelined variant of the fused Gaussian+Sobel stencil kernel.

ops/pallas/stencil.py issues a manual halo DMA and waits on it inside each
grid step — DMA and compute serialize. This variant expresses the
overlapping windows as THREE standard BlockSpec inputs (main tile + 8-row
top/bottom halo strips pre-gathered in XLA), so Mosaic's pipeline machinery
double-buffers the loads across grid steps automatically.

Same math and border semantics as v1 (bit-exact vs golden); the wrapper
gathers the halo strips with one cheap row-gather (≈6% of the image).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _clamp_tile_rows, GAUSS_R, RPAD, _G5, _interpret, _round_up, _taps_h, _taps_v

HSTRIP = 8  # halo strip rows (Mosaic block sublane granularity)


def _kernel(main_ref, top_ref, bot_ref, out_ref, bl_ref, *, th, w, n_tiles, rem):
    j = pl.program_id(1)
    # Window rows [t0-4, t0+th+4): strips carry 4 rows each side + overlap.
    a = jnp.concatenate(
        [top_ref[0, :4, :], main_ref[0], bot_ref[0, 4:, :]], axis=0
    ).astype(jnp.int32)

    tmp = _taps_h(a, _G5, w, 0)
    acc = _taps_v(tmp, _G5, th + 2, RPAD - GAUSS_R - 1)
    blur = (acc + 128) >> 8

    bl_ref[:, 1 : w + 1] = blur
    bl_ref[:, 0] = blur[:, 0]
    bl_ref[:, w + 1] = blur[:, w - 1]

    @pl.when(j == 0)
    def _():
        bl_ref[0, :] = bl_ref[1, :]

    @pl.when(j == n_tiles - 1)
    def _():
        bl_ref[rem + 1, :] = bl_ref[rem, :]

    b = bl_ref[:]
    smooth_v = _taps_v(b, (1, 2, 1), th, 0)
    diff_v = _taps_v(b, (-1, 0, 1), th, 0)
    gx = _taps_h(smooth_v, (-1, 0, 1), w, 0)
    gy = _taps_h(diff_v, (1, 2, 1), w, 0)

    mag2 = gx * gx + gy * gy
    s = jnp.sqrt(mag2.astype(jnp.float32)).astype(jnp.int32)
    s = jnp.where((s + 1) * (s + 1) <= mag2, s + 1, s)
    s = jnp.where(s * s > mag2, s - 1, s)
    out_ref[0, :, :] = jnp.minimum(s, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("tile_rows",))
def blur_sobel_mag_pallas_v2(gray: jax.Array, tile_rows: int = 128) -> jax.Array:
    squeeze = gray.ndim == 2
    if squeeze:
        gray = gray[None]
    n, h, w = gray.shape
    wp = _round_up(w + 2 * GAUSS_R, 128)
    th = _clamp_tile_rows(tile_rows, h, wp)
    n_tiles = -(-h // th)
    h_pad = n_tiles * th
    rem = h - (n_tiles - 1) * th
    padded = jnp.pad(
        gray,
        [(0, 0), (RPAD, RPAD + (h_pad - h)), (GAUSS_R, wp - w - GAUSS_R)],
        mode="edge",
    )  # rows: image row r ↦ padded row r + RPAD

    main = padded[:, RPAD : RPAD + h_pad, :]
    # Strip j covers padded rows [j*th, j*th+8) (top) / [(j+1)*th, +8) (bot).
    base = np.arange(n_tiles * HSTRIP)
    t_idx = jnp.asarray(base // HSTRIP * th + base % HSTRIP, jnp.int32)
    b_idx = jnp.asarray((base // HSTRIP + 1) * th + base % HSTRIP, jnp.int32)
    top = jnp.take(padded, t_idx, axis=1)
    bot = jnp.take(padded, b_idx, axis=1)

    out = pl.pallas_call(
        partial(_kernel, th=th, w=w, n_tiles=n_tiles, rem=rem),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, th, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HSTRIP, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HSTRIP, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2), jnp.int32)],
        interpret=_interpret(),
    )(main, top, bot)
    out = out[:, :h, :]
    return out[0] if squeeze else out

"""v3 fused Gaussian+Sobel stencil: auto-pipelined, zero-copy halos.

v1 (stencil.py) serializes a manual halo DMA with compute inside each grid
step. v2 (stencil_v2.py) lets Mosaic double-buffer via BlockSpecs but pays
an XLA-side full-image slice copy for the main input plus two halo
row-gathers. v3 removes ALL of that: because the tile height is a multiple
of 8 and the top padding is 4 rows, the padded image itself serves as the
main input — block j's rows ``[j·th, (j+1)·th)`` are image rows
``[j·th − 4, …)``, i.e. the tile WITH its top halo already in place — and
the bottom halo is an overlapping 8-row strip view of the same array at
block-aligned offset ``(j+1)·th``. Two BlockSpec inputs, one underlying
buffer, no gather, and Mosaic pipelines the loads across grid steps.

Same math and border semantics as v1/v2 (bit-exact vs the golden chain).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _clamp_tile_rows, GAUSS_R, RPAD, _G5, _interpret, _round_up, _taps_h, _taps_v

HSTRIP = 8  # bottom halo strip rows (Mosaic block sublane granularity)


def _kernel(main_ref, bot_ref, out_ref, bl_ref, *, th, w, n_tiles, rem):
    j = pl.program_id(1)
    # Main block = image rows [j·th-4, (j+1)·th-4) (starts 4 rows above the
    # tile thanks to the top padding); the 8-row strip continues it exactly:
    # image [(j+1)·th-4, (j+1)·th+4). Window row v ↦ image row j·th + v - 4,
    # identical to v1's scratch indexing.
    a = jnp.concatenate([main_ref[0], bot_ref[0]], axis=0).astype(jnp.int32)

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
def blur_sobel_mag_pallas_v3(gray: jax.Array, tile_rows: int = 128) -> jax.Array:
    squeeze = gray.ndim == 2
    if squeeze:
        gray = gray[None]
    n, h, w = gray.shape
    wp = _round_up(w + 2 * GAUSS_R, 128)
    th = _clamp_tile_rows(tile_rows, h, wp)
    n_tiles = -(-h // th)
    h_pad = n_tiles * th
    rem = h - (n_tiles - 1) * th
    # Rows: RPAD on top, and enough at the bottom that the last tile's main
    # block AND its strip exist: total rows = h_pad + 2*RPAD (≡ 0 mod 8).
    padded = jnp.pad(
        gray,
        [(0, 0), (RPAD, (h_pad - h) + RPAD), (GAUSS_R, wp - w - GAUSS_R)],
        mode="edge",
    )  # padded row p ↦ image row p - RPAD

    out = pl.pallas_call(
        partial(_kernel, th=th, w=w, n_tiles=n_tiles, rem=rem),
        grid=(n, n_tiles),
        in_specs=[
            # Main: rows [j*th, j*th+th) of padded = image [j*th-4, …).
            pl.BlockSpec((1, th, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            # Bottom strip: padded rows [(j+1)*th, +8) — overlapping view of
            # the SAME array at block-aligned offset (th % 8 == 0).
            pl.BlockSpec(
                (1, HSTRIP, wp),
                lambda i, j, _th=th: (i, (j + 1) * (_th // HSTRIP), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((th + 2, w + 2), jnp.int32)],
        interpret=_interpret(),
    )(padded, padded)
    out = out[:, :h, :]
    return out[0] if squeeze else out

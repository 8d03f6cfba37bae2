"""Pallas fused Harris-response kernel.

Fuses the dense part of BASELINE config 4 — gray u8 → Sobel gradients
(integer, exact) → normalized float32 gradient products → 5×5 Gaussian
windowing → response ``det(M) − k·tr(M)²`` — into one pass over row tiles in
VMEM (the XLA lowering materializes every one of the ~8 stencil stages in
HBM). Thresholding against the global max and the 3×3 NMS remain in XLA (a
global reduction cannot live inside a row-tiled kernel).

Matches :func:`rustcv_tpu.ops.golden.harris_response` including its border
rule: gradients are computed on the replicate-padded *original* gray, but
the Gaussian window smooths replicate-padded *products* — so the kernel
computes products at valid positions only and explicitly replicates product
rows (``pl.when`` edge fixes) and columns (halo concat) before windowing,
the same two-stage technique as ops/pallas/stencil.py. Float32 arithmetic ⇒
parity with the NumPy oracle is tolerance-based (positional for corners).

Index map per tile j (tile rows = image rows [t0, t0+th), t0 = j·th):
- DMA window: padded rows [j·th, j·th+th+2·RPAD) = image rows [t0−4, t0+th+4)
  (image row r ↦ window row r−t0+4); cols: image col c ↦ padded col c+HALO.
- product rows q ∈ [0, th+4) = image rows t0−2+q: gray window rows q+1..q+3.
- gradient col c ∈ [0, W): window cols c+2..c+4.
- window output row o ∈ [0, th) uses product rows o..o+4.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _interpret, _round_up, _taps_h, _taps_v

SOBEL_R = 1
WIN_R = 2
HALO = SOBEL_R + WIN_R  # 3 input cols beyond each edge
RPAD = 4  # rows padded per side (DMA windows must be 8-row multiples)
_G5F = tuple(x / 16.0 for x in (1.0, 4.0, 6.0, 4.0, 1.0))



def _kernel(
    in_hbm, out_ref, sxx_ref, syy_ref, sxy_ref,
    *, th: int, w: int, wp: int, n_tiles: int, rem: int, k: float,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            in_hbm.at[i, pl.ds(j * th, th + 2 * RPAD), :], scratch, sem
        )
        dma.start()
        dma.wait()
        a = scratch[:].astype(jnp.int32)  # (th+8, Wp) gray

        # Sobel at product rows [0, th+4) (image rows t0-2 …), cols [0, W).
        ph = th + 2 * WIN_R
        sv = _taps_v(a, (1, 2, 1), ph, 1)
        dv = _taps_v(a, (-1, 0, 1), ph, 1)
        gx = _taps_h(sv, (-1, 0, 1), w, HALO - 1)
        gy = _taps_h(dv, (1, 2, 1), w, HALO - 1)

        norm = jnp.float32(1.0 / (255.0 * 4.0))
        fx = gx.astype(jnp.float32) * norm
        fy = gy.astype(jnp.float32) * norm
        sxx_ref[:, :] = fx * fx
        syy_ref[:, :] = fy * fy
        sxy_ref[:, :] = fx * fy

        # Product-row replication at the global edges (golden pads the
        # PRODUCTS; rows beyond the image must equal the edge row's products,
        # not products computed from replicated gray).
        refs = (sxx_ref, syy_ref, sxy_ref)

        @pl.when(j == 0)
        def _():
            for r in refs:
                r[0, :] = r[2, :]  # image row -2 := row 0
                r[1, :] = r[2, :]  # image row -1 := row 0

        @pl.when(j == n_tiles - 1)
        def _():
            for r in refs:
                r[rem + 2, :] = r[rem + 1, :]  # image row h   := row h-1
                r[rem + 3, :] = r[rem + 1, :]  # image row h+1 := row h-1

        # 5×5 window: replicate product COLUMNS, horizontal then vertical.
        res = []
        for r in refs:
            pv = r[:, :]
            ext = jnp.concatenate(
                [pv[:, :1], pv[:, :1], pv, pv[:, -1:], pv[:, -1:]], axis=1
            )
            tmp = _taps_h(ext, _G5F, w, 0)
            res.append(_taps_v(tmp, _G5F, th, 0))
        sxx, syy, sxy = res
        det = sxx * syy - sxy * sxy
        tr = sxx + syy
        out_ref[0, :, :] = det - jnp.float32(k) * tr * tr

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((th + 2 * RPAD, wp), jnp.uint8),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, static_argnames=("k", "tile_rows"))
def harris_response_pallas(
    gray: jax.Array, k: float = 0.04, tile_rows: int = 128
) -> jax.Array:
    """Harris response on u8 gray [N, H, W] (or [H, W]) → f32, fused."""
    squeeze = gray.ndim == 2
    if squeeze:
        gray = gray[None]
    n, h, w = gray.shape
    # VMEM-aware clamp like the blur/Sobel kernels, with a fatter per-row
    # cost (three extra f32 scratch planes + wider int32/f32 intermediates:
    # ~60 B/row/lane-column — measured 17.98 MB at an 88-row tile, wp 3968).
    wp = _round_up(w + 2 * HALO, 128)
    th = min(
        _round_up(tile_rows, 8), _round_up(h, 8),
        max(8, (15_000_000 // (60 * wp)) // 8 * 8),
    )
    n_tiles = -(-h // th)
    h_pad = n_tiles * th
    rem = h - (n_tiles - 1) * th
    padded = jnp.pad(
        gray,
        [(0, 0), (RPAD, RPAD + (h_pad - h)), (HALO, wp - w - HALO)],
        mode="edge",
    )

    out = pl.pallas_call(
        partial(_kernel, th=th, w=w, wp=wp, n_tiles=n_tiles, rem=rem, k=k),
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * WIN_R, w), jnp.float32) for _ in range(3)
        ],
        interpret=_interpret(),
    )(padded)
    out = out[:, :h, :]
    return out[0] if squeeze else out

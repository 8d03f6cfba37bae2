"""The whole headline tick as ONE Pallas kernel: YUYV words → BT.601 →
rectangle overlay → packed-BGR byte interleave AND 5×5 Gaussian + Sobel
|∇| — per row tile, entirely in VMEM.

Phase 3 of the r4 relayout attack (see decode_interleave.py for phase 1/2
and the gather construction). Folding the stencil in means gray NEVER
touches HBM: the XLA composition writes gray (16.6 MB), re-reads it padded
(~34 MB) and runs a second kernel; here the gray window (tile ± 4 halo
rows) is decoded in-register from overlapping input BlockSpecs — the same
zero-copy halo trick as stencil_v3, but on the WIRE words, so the only HBM
traffic is: read wire tile (+2 thin strips), write BGR, write filtered.

Math is digit-identical to the golden chain (gaussian5_u8 → sobel3_gray →
gradient_magnitude_u8) including its two-stage border rule, and to
rectangle_packed / yuyv_to_bgr_packed — tested in tests/test_pallas_decode.py
(interpret) and probe_parity_tpu.py (real chip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_interleave import _interleave_store, _interpret
from .stencil import _G5, _taps_h, _taps_v

_BT601_GRAY = (77, 150, 29)  # r, g, b weights (golden.bgr_to_gray)


def _decode6(words_i32, w: int, h: int):
    """u32 YUYV words (rows, P) → six i32 pair planes (b0,g0,r0,b1,g1,r1),
    digit-identical to color._bt601_pair."""
    y0 = words_i32 & 255
    u = (words_i32 >> 8) & 255
    y1 = (words_i32 >> 16) & 255
    v = (words_i32 >> 24) & 255
    c0 = 298 * (y0 - 16)
    c1 = 298 * (y1 - 16)
    d = u - 128
    e = v - 128
    tb = 516 * d + 128
    tg = -100 * d - 208 * e + 128
    tr = 409 * e + 128

    def cl(x):
        return jnp.clip(x >> 8, 0, 255)

    return cl(c0 + tb), cl(c0 + tg), cl(c0 + tr), cl(c1 + tb), cl(c1 + tg), cl(c1 + tr)


def _gray_pairs(b0, g0, r0, b1, g1, r1):
    wr, wg, wb = _BT601_GRAY
    gr0 = (wr * r0 + wg * g0 + wb * b0 + 128) >> 8
    gr1 = (wr * r1 + wg * g1 + wb * b1 + 128) >> 8
    return gr0, gr1


def _interleave_vals(planes, rows, P, K):
    """Like decode_interleave._interleave_store but returns the interleaved
    (rows, K*P) i32 array instead of storing (used for the in-register gray
    window)."""
    if P < 128:
        planes = [jnp.pad(p, [(0, 0), (0, 128 - P)]) for p in planes]
        srcP = 128
    else:
        srcP = P
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    L = K * P
    cols = []
    for v in range(-(-L // 128)):
        width = min(128, L - 128 * v)
        a = (128 * v) // K
        s0 = min(a, srcP - 128)
        idx = (lane + 128 * v) // K - s0
        mod = (lane + 128 * v) % K
        parts = [
            jnp.take_along_axis(p[:, s0 : s0 + 128], idx, axis=1)
            for p in planes
        ]
        val = parts[0]
        for s in range(1, K):
            val = jnp.where(mod == s, parts[s], val)
        cols.append(val[:, :width])
    return jnp.concatenate(cols, axis=1)


def _kernel(
    words_ref, top_ref, bot_ref, rect_ref, color_ref, thick_ref,
    bgr_ref, filt_ref,
    *, th, w, h, n_tiles, overlay,
):
    P = w // 2
    i_n = pl.program_id(0)
    j = pl.program_id(1)

    main = words_ref[0].astype(jnp.int32)           # (th, P)
    pl6 = _decode6(main, w, h)
    gr0, gr1 = _gray_pairs(*pl6)
    gray_main = _interleave_vals((gr0, gr1), th, P, 2)  # (th, W) i32

    # Halo gray rows from the overlapping 8-row strips (replicate-edge at
    # the image boundary, matching jnp.pad(..., mode="edge")).
    t6 = _decode6(top_ref[0, 4:8].astype(jnp.int32), w, h)
    top4 = _interleave_vals(_gray_pairs(*t6), 4, P, 2)
    b6 = _decode6(bot_ref[0, 0:4].astype(jnp.int32), w, h)
    bot4 = _interleave_vals(_gray_pairs(*b6), 4, P, 2)
    top4 = jnp.where(j == 0, jnp.broadcast_to(gray_main[0:1], (4, w)), top4)
    bot4 = jnp.where(
        j == n_tiles - 1, jnp.broadcast_to(gray_main[th - 1 : th], (4, w)),
        bot4,
    )
    gw = jnp.concatenate([top4, gray_main, bot4], axis=0)  # (th+8, W)
    # width replicate ±2 (the Gaussian's horizontal halo)
    gwp = jnp.concatenate(
        [gw[:, :1], gw[:, :1], gw, gw[:, w - 1 :], gw[:, w - 1 :]], axis=1
    )  # (th+8, W+4); image col c at array col c+2

    # 5×5 Gaussian at centers rows [-1, th+1), cols [0, W) — v1/v3 math.
    tmp = _taps_h(gwp, _G5, w, 0)
    acc = _taps_v(tmp, _G5, th + 2, 1)
    blur = (acc + 128) >> 8                        # (th+2, W)

    # Two-stage border rule: the Sobel pass sees the blurred map with
    # replicate-edge rows/cols. Rows [0, th+2) cover centers [-1, th+1);
    # at the image edges (first/last tile) the out-of-image row is the
    # replicated edge row. Pure value ops — Mosaic scratch slicing of an
    # unaligned (W+2) minor is not needed.
    blur = jnp.where(
        j == 0,
        jnp.concatenate(
            [blur[1:2], blur[1:]], axis=0), blur)
    blur = jnp.where(
        j == n_tiles - 1,
        jnp.concatenate([blur[: th + 1], blur[th : th + 1]], axis=0),
        blur,
    )
    b = jnp.concatenate(
        [blur[:, :1], blur, blur[:, w - 1 :]], axis=1
    )  # (th+2, W+2)
    smooth_v = _taps_v(b, (1, 2, 1), th, 0)
    diff_v = _taps_v(b, (-1, 0, 1), th, 0)
    gx = _taps_h(smooth_v, (-1, 0, 1), w, 0)
    gy = _taps_h(diff_v, (1, 2, 1), w, 0)
    mag2 = gx * gx + gy * gy
    s = jnp.sqrt(mag2.astype(jnp.float32)).astype(jnp.int32)
    s = jnp.where((s + 1) * (s + 1) <= mag2, s + 1, s)
    s = jnp.where(s * s > mag2, s - 1, s)
    s = jnp.minimum(s, 255)
    Lg = filt_ref.shape[-1]
    if Lg != w:  # pad-tail lanes of the 128-aligned block (sliced outside)
        s = jnp.pad(s, [(0, 0), (0, Lg - w)])
    filt_ref[0, :, :] = s.astype(jnp.uint8)

    # Overlay + packed-BGR interleave (phase-2 logic, unchanged).
    b0, g0, r0, b1, g1, r1 = pl6
    if overlay:
        ys = jax.lax.broadcasted_iota(jnp.int32, (th, P), 0) + j * th
        xe = jax.lax.broadcasted_iota(jnp.int32, (th, P), 1) * 2
        xo = xe + 1
        x, y, rw, rh = (rect_ref[i_n, i] for i in range(4))
        t = thick_ref[i_n, 0]
        x_min = jnp.maximum(x, 0)
        y_min = jnp.maximum(y, 0)
        x_max = jnp.minimum(x + rw, w)
        y_max = jnp.minimum(y + rh, h)
        degenerate = (x_min >= x_max) | (y_min >= y_max)
        y_span = (ys >= y_min) & (ys < y_max)
        top_bot = ((ys >= y_min) & (ys < y_min + t)) | (
            (ys >= y_max - t) & (ys < y_max)
        )

        def rect_mask(xs):
            x_span = (xs >= x_min) & (xs < x_max)
            left_right = ((xs >= x_min) & (xs < x_min + t)) | (
                (xs >= x_max - t) & (xs < x_max)
            )
            return ((x_span & top_bot) | (y_span & left_right)) & ~degenerate

        me, mo = rect_mask(xe), rect_mask(xo)
        cb, cg, cr = (color_ref[i_n, i] for i in range(3))
        b0 = jnp.where(me, cb, b0)
        g0 = jnp.where(me, cg, g0)
        r0 = jnp.where(me, cr, r0)
        b1 = jnp.where(mo, cb, b1)
        g1 = jnp.where(mo, cg, g1)
        r1 = jnp.where(mo, cr, r1)

    # K=6 u8 interleave (see decode_interleave: the u16 K=3 form's 3·P
    # minor dim is not 128-lane aligned at 1080p and fails Mosaic's
    # memref_slice for the output DMA).
    _interleave_store((b0, g0, r0, b1, g1, r1), bgr_ref.at[0], th, P, 6,
                      jnp.uint8)


def _tile_rows_fused(h: int, w: int, cap: int = 128) -> int:
    """Largest 8-multiple tile ≤ cap dividing h that fits the fused
    kernel's VMEM working set (~40 B/row/lane across gray window, blur
    scratch, decode planes, and the double-buffered in/out blocks)."""
    budget = max(8, (13_000_000 // (40 * max(w, 1))) // 8 * 8)
    for t in range(min(cap, h, budget) - min(cap, h, budget) % 8, 0, -8):
        if h % t == 0:
            return t
    return 0


@partial(jax.jit, static_argnames=("width", "height", "overlay"))
def yuyv_tick_fused(
    src: jax.Array,
    width: int,
    height: int,
    rects=None,
    colors=None,
    thickness=None,
    overlay: bool = False,
):
    """YUYV wire bytes u8 (N, H·W·2) → (bgr u8 (N, H, W·3), filtered u8
    (N, H, W)) — decode, overlay, interleave AND blur+Sobel in one kernel.
    Returns None when the geometry doesn't fit (caller falls back)."""
    n = src.shape[0]
    th = _tile_rows_fused(height, width)
    # Strip indices are clamped into range; edge tiles overwrite the strip
    # with replicate-edge rows, so only 8 | height and an 8-divisible tile
    # are required.
    if th == 0 or width % 2 or height % 8:
        return None
    P = width // 2
    # Output minors padded to 128-lane multiples (see decode_interleave).
    Lb = -(-6 * P // 128) * 128
    Lg = -(-2 * P // 128) * 128
    words = jax.lax.bitcast_convert_type(
        src.reshape(n, height, P, 4), jnp.uint32
    )
    n_tiles = height // th
    tb = th // 8  # strip blocks per tile
    if overlay:
        rect_arg = jnp.asarray(rects, jnp.int32).reshape(n, 4)
        color_arg = jnp.asarray(colors).astype(jnp.int32).reshape(n, 3)
        thick_arg = jnp.broadcast_to(
            jnp.asarray(thickness, jnp.int32).reshape(-1), (n,)
        ).reshape(n, 1)
    else:
        rect_arg = jnp.zeros((n, 4), jnp.int32)
        color_arg = jnp.zeros((n, 3), jnp.int32)
        thick_arg = jnp.zeros((n, 1), jnp.int32)

    bgr, filt = pl.pallas_call(
        partial(_kernel, th=th, w=width, h=height, n_tiles=n_tiles,
                overlay=overlay),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, th, P), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            # 8-row strip ending at the tile's first row (clamped at j=0;
            # kernel replaces it with replicate-edge there)
            pl.BlockSpec(
                (1, 8, P),
                lambda i, j, _tb=tb: (i, jnp.maximum(j * _tb - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            # 8-row strip starting at the tile's one-past-last row (clamped
            # at the last tile; kernel replaces with replicate-edge there)
            pl.BlockSpec(
                (1, 8, P),
                lambda i, j, _tb=tb, _nb=height // 8: (
                    i, jnp.minimum((j + 1) * _tb, _nb - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, th, Lb), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th, Lg), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, height, Lb), jnp.uint8),
            jax.ShapeDtypeStruct((n, height, Lg), jnp.uint8),
        ),
        interpret=_interpret(),
    )(words, words, words, rect_arg, color_arg, thick_arg)
    if Lb != 6 * P:
        bgr = bgr[:, :, : 6 * P]
    if Lg != 2 * P:
        filt = filt[:, :, : 2 * P]
    return bgr, filt

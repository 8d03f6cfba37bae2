"""Fused YUYV→packed-BGR decode with IN-KERNEL byte interleave (+overlay).

VERDICT r3 #2: the headline tick's dominant waste is XLA's lowering of the
stride-3 byte interleave — ~430 MB/tick of broadcast/relayout copies at
8×1080p (docs/PERFORMANCE.md roofline: 605 MB writes vs ~150 MB ideal).
Mosaic on this toolchain has no strided vector loads/stores and no
multi-vreg lane gathers (probe_mosaic_shuffle.py), but single-source-vreg
``tpu.dynamic_gather`` works — so the interleave CAN be emitted in one
pass, chunked so every gather's source is exactly one 128-lane vreg:

    out[:, K·128·c + j] = plane_{j mod K}[:, 128·c + j//K]   (j < K·128)

Per 128 source lanes that is K gathers + K−1 selects of i32 vectors —
pure VPU work that overlaps the output DMA, instead of XLA's multi-pass
HBM relayout.

The kernel fuses the whole per-tile chain: u32 YUYV words → BT.601 pair
math (bit-exact ``color._bt601_pair`` formulas, decode.rs:160-191 port) →
optional rectangle overlay applied on the six pair planes (bit-exact
``draw._edge_masks`` semantics) → stride-6 byte interleave into packed
BGR and stride-2 interleave into gray.

Outputs:
  * ``bgr`` u8 (N, H, W·3) — the packed-rows contract, bytes in final
    order straight out of the kernel (K=6 interleave of the six pair
    byte-planes; the kernel's block minor is padded to a 128-lane
    multiple and sliced off outside when 3·W isn't one — free at the hot
    widths).
  * ``gray`` u8 (N, H, W) — identical to ``color.yuyv_to_gray``.

Tested bit-exact against the XLA path in tests/test_pallas_decode.py
(interpret mode on CPU; probe_parity_tpu.py re-checks on real TPU).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu" or os.environ.get(
        "RUSTCV_PALLAS_INTERPRET"
    ) == "1"


def _interleave_store(planes, out_ref, rows, P, K, dtype):
    """Write out[:, K·i + s] = planes[s][:, i] for i < P, one output vreg
    column at a time: Mosaic's ``dynamic_gather`` needs idx.shape ==
    src.shape and a single source vreg along the gather dim, so each
    128-lane output column gathers from a 128-lane source window at the
    (unaligned, static) offset ``(128·v)//K``. Windows and index patterns
    repeat every K output columns, so only K distinct constant index
    vectors exist after CSE.

    ``out_ref``'s minor dim may exceed the logical K·P (padded to a
    128-lane multiple so Mosaic never needs an unaligned memref_slice for
    the output DMA); every store is a full 128-lane vreg, with gather
    indices clamped in the pad tail (garbage lanes, sliced off by the
    caller)."""
    if P < 128:
        pad = [(0, 0), (0, 128 - P)]
        planes = [jnp.pad(p, pad) for p in planes]
        srcP = 128
    else:
        srcP = P
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    Lp = out_ref.shape[-1]
    for v in range(Lp // 128):
        a = (128 * v) // K
        s0 = min(a, srcP - 128)
        idx = jnp.clip((lane + 128 * v) // K - s0, 0, 127)
        mod = (lane + 128 * v) % K
        parts = [
            jnp.take_along_axis(p[:, s0 : s0 + 128], idx, axis=1)
            for p in planes
        ]
        val = parts[0]
        for s in range(1, K):
            val = jnp.where(mod == s, parts[s], val)
        out_ref[:, 128 * v : 128 * v + 128] = val.astype(dtype)


def _kernel(
    words_ref, rect_ref, color_ref, thick_ref, bgr_ref, gray_ref,
    *, th, w, h, overlay,
):
    P = w // 2
    words = words_ref[0].astype(jnp.int32)
    y0 = words & 255
    u = (words >> 8) & 255
    y1 = (words >> 16) & 255
    v = (words >> 24) & 255

    # BT.601 pair math — digit-identical to color._bt601_pair.
    c0 = 298 * (y0 - 16)
    c1 = 298 * (y1 - 16)
    d = u - 128
    e = v - 128
    tb = 516 * d + 128
    tg = -100 * d - 208 * e + 128
    tr = 409 * e + 128

    def cl(x):
        return jnp.clip(x >> 8, 0, 255)

    b0, g0, r0 = cl(c0 + tb), cl(c0 + tg), cl(c0 + tr)
    b1, g1, r1 = cl(c1 + tb), cl(c1 + tg), cl(c1 + tr)

    # Gray BEFORE overlay (pipeline order: filter input is the clean frame).
    gr0 = (77 * r0 + 150 * g0 + 29 * b0 + 128) >> 8
    gr1 = (77 * r1 + 150 * g1 + 29 * b1 + 128) >> 8
    _interleave_store((gr0, gr1), gray_ref.at[0], th, P, 2, jnp.uint8)

    if overlay:
        # draw._edge_masks on pair-plane coordinates (even x = 2i, odd
        # x = 2i+1), bit-exact with rectangle_packed.
        i_n = pl.program_id(0)
        j = pl.program_id(1)
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

    # K=6 byte interleave straight to u8: out[:, 6i+s] = plane_s[:, i]
    # (b,g,r per even then odd pixel). A u16-word K=3 form was tried first
    # but its minor dim 3·P is not 128-lane aligned at 1080p (2880 = 22.5
    # vregs) — Mosaic cannot memref_slice the padded packed-i16 block for
    # the HBM DMA ("Slice shape ... must be aligned to tiling (128)");
    # 6·P = 3·W is aligned whenever W % 128 == 0.
    _interleave_store((b0, g0, r0, b1, g1, r1), bgr_ref.at[0], th, P, 6,
                      jnp.uint8)


def _tile_rows(h: int, cap: int = 128) -> int:
    """Largest multiple of 8 ≤ cap dividing h (0 if none — caller falls
    back to the XLA path)."""
    for t in range(min(cap, h) - min(cap, h) % 8, 0, -8):
        if h % t == 0:
            return t
    return 0


@partial(jax.jit, static_argnames=("width", "height", "overlay"))
def yuyv_decode_interleave(
    src: jax.Array,
    width: int,
    height: int,
    rects=None,
    colors=None,
    thickness=None,
    overlay: bool = False,
):
    """YUYV wire bytes u8 (N, H·W·2) → (bgr_packed u8 (N, H, W·3),
    gray u8 (N, H, W)), overlay composited in-kernel when requested.

    Returns None when the geometry doesn't fit the kernel's constraints
    (odd width / height with no 8-divisible tiling) — callers fall back to
    the XLA path.
    """
    n = src.shape[0]
    th = _tile_rows(height)
    if th == 0 or width % 2:
        return None
    P = width // 2
    # Output minor dims padded to 128-lane multiples (Mosaic cannot
    # memref_slice an unaligned packed-dtype block for the HBM DMA); the
    # hot widths (640/1280/1920/3840) need no padding.
    Lb = -(-6 * P // 128) * 128
    Lg = -(-2 * P // 128) * 128
    words = jax.lax.bitcast_convert_type(
        src.reshape(n, height, P, 4), jnp.uint32
    )
    n_tiles = height // th
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

    bgr, gray = pl.pallas_call(
        partial(_kernel, th=th, w=width, h=height, overlay=overlay),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, th, P), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
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
    )(words, rect_arg, color_arg, thick_arg)
    if Lb != 6 * P:
        bgr = bgr[:, :, : 6 * P]
    if Lg != 2 * P:
        gray = gray[:, :, : 2 * P]
    return bgr, gray

"""The capture mega-kernel: sim-capture → YUYV decode → gray → Gaussian5 →
Sobel → |∇| → rectangle overlay, ONE Pallas kernel.

This is the whole BASELINE north-star tick fused to its physical floor:

- **Zero input DMA.** The simulated sensor is closed-form in (x, y, seq)
  (ops/synth.py spec), so every tile synthesizes its own window including
  stencil halos — nothing is read from HBM except 4 tiny scalar arrays.
- **Phase decomposition instead of interleaves.** All math runs on four
  column-phase planes (x ≡ 0..3 mod 4) of shape (rows, W/4): YUYV chroma
  pairing, BT.601 decode, gray, and both stencils become pure plane
  arithmetic — the horizontal convolutions are decomposed onto phases
  (``_conv_phases``) so no strided lane access ever happens.
- **Word-packed outputs.** BGR bytes and the magnitude map leave the kernel
  as little-endian u32 words ((N, H, 3W/4) and (N, H, W/4)); a NumPy
  ``.view(uint8)`` on the host (or an XLA bitcast on device) reinterprets
  them for free. HBM traffic = exactly the two outputs.

Bit-exact with the golden chain
``encode_yuyv(synth_bgr) → yuyv_to_bgr → bgr_to_gray → gaussian5 → sobel →
isqrt-magnitude → rectangle`` including the two-stage stencil border rule
(Gaussian replicates the original, Sobel replicates the *blurred* image —
enforced via explicit row/col replication, like ops/pallas/stencil.py).

Scope: YUYV device-sim streams with W ≡ 0 (mod 4) — exactly the headline
bench model; the generic XLA pipeline covers everything else.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..synth import _BAR_COLORS_BGR

_G5 = (1, 4, 6, 4, 1)
P = 4  # column phases


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Phase-decomposed horizontal convolution
# ---------------------------------------------------------------------------


def _conv_phases(phases: Sequence[jax.Array], weights, radius: int, left, right):
    """1-D conv along x on P-phase planes.

    ``phases[s][r, q]`` holds column ``4q+s``. ``left``/``right`` are (rows, 1)
    replicate values standing in for all columns < 0 / ≥ W (valid because
    ``radius < P`` ⇒ only the nearest out-of-range group is ever touched and
    every referenced out-of-range column maps to the replicate value).
    Returns P planes of the same (rows, Q) shape.
    """
    q = phases[0].shape[-1]
    ext = [jnp.concatenate([left, ph, right], axis=-1) for ph in phases]  # (rows, Q+2)
    outs = []
    for s in range(P):
        acc = None
        for k, w in enumerate(weights):
            if w == 0:
                continue
            t = s - radius + k
            p = t % P
            d = t // P  # -1, 0, or +1 for radius < P
            sl = ext[p][:, 1 + d : 1 + d + q]
            term = sl if w == 1 else w * sl
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs


def _taps_rows(a: jax.Array, weights, height: int, start: int):
    acc = None
    for k, w in enumerate(weights):
        if w == 0:
            continue
        sl = a[start + k : start + k + height, :]
        term = sl if w == 1 else w * sl
        acc = term if acc is None else acc + term
    return acc


# ---------------------------------------------------------------------------
# Pattern + wire-format YUV at phase resolution (spec: ops/synth.py)
# ---------------------------------------------------------------------------


def _pattern_phase(seq, xs, ys, width: int, height: int):
    """(b, g, r) i32 planes for integer coordinate grids xs/ys."""
    b = jnp.zeros_like(xs)
    g = jnp.zeros_like(xs)
    r = jnp.zeros_like(xs)
    wmax = max(width, 1)
    for idx, (bb, gg, rr) in enumerate(_BAR_COLORS_BGR.tolist()):
        lo = -(-idx * wmax // 8)
        hi = -(-(idx + 1) * wmax // 8)
        m = (xs >= lo) if idx == 7 else ((xs >= lo) & (xs < hi))
        b = jnp.where(m, bb, b)
        g = jnp.where(m, gg, g)
        r = jnp.where(m, rr, r)

    gy0 = height * 2 // 3
    grad = (xs + ys + seq * 7) % 256
    in_grad = ys >= gy0
    b = jnp.where(in_grad, grad, b)
    g = jnp.where(in_grad, 255 - grad, g)
    r = jnp.where(in_grad, (grad * 2) % 256, r)

    sq = max(4, height // 8)
    span = max(1, width - sq)
    pos = (seq * max(2, width // 64)) % (2 * span)
    x0 = jnp.where(pos < span, pos, 2 * span - pos)
    y0 = max(0, height // 2 - sq // 2)
    in_sq = (ys >= y0) & (ys < y0 + sq) & (xs >= x0) & (xs < x0 + sq)
    b = jnp.where(in_sq, 255, b)
    g = jnp.where(in_sq, 255, g)
    r = jnp.where(in_sq, 255, r)
    return b, g, r


def _wire_yuv_phases(seq, ys, width: int, height: int, q: int):
    """Per-phase wire-format (Y, U_pair, V_pair) i32 planes.

    Chroma is the YUYV pair average ((a+b+1)>>1) shared by phases {0,1} and
    {2,3} — exactly encode_yuyv's quantization.
    """
    rows = ys.shape[0]
    qs = jax.lax.broadcasted_iota(jnp.int32, (rows, q), 1)
    ysb = jnp.broadcast_to(ys, (rows, q))
    yy, uu, vv = [], [], []
    for s in range(P):
        b, g, r = _pattern_phase(seq, qs * 4 + s, ysb, width, height)
        y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
        u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
        v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
        yy.append(jnp.clip(y, 0, 255))
        uu.append(jnp.clip(u, 0, 255))
        vv.append(jnp.clip(v, 0, 255))
    u01 = (uu[0] + uu[1] + 1) >> 1
    u23 = (uu[2] + uu[3] + 1) >> 1
    v01 = (vv[0] + vv[1] + 1) >> 1
    v23 = (vv[2] + vv[3] + 1) >> 1
    return yy, (u01, u01, u23, u23), (v01, v01, v23, v23)


def _decode_phases(yy, uu, vv):
    """Wire YUV phases → (B, G, R, gray) i32 phase planes (BT.601 inverse +
    integer luma, clamped — decode.rs:160-191 / golden.bgr_to_gray)."""
    B, G, R, GRAY = [], [], [], []
    for s in range(P):
        c = 298 * (yy[s] - 16)
        d = uu[s] - 128
        e = vv[s] - 128
        b = jnp.clip((c + 516 * d + 128) >> 8, 0, 255)
        g = jnp.clip((c - 100 * d - 208 * e + 128) >> 8, 0, 255)
        r = jnp.clip((c + 409 * e + 128) >> 8, 0, 255)
        B.append(b)
        G.append(g)
        R.append(r)
        GRAY.append((77 * r + 150 * g + 29 * b + 128) >> 8)
    return B, G, R, GRAY


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _kernel(
    seqs_ref, rects_ref, colors_ref, thick_ref,  # scalar prefetch (SMEM)
    bgr_out, mag_out,  # outputs (VMEM blocks)
    *blur_scr,  # P VMEM scratch planes for the blurred image
    th: int, w: int, h: int, n_tiles: int, rem: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = w // P
    rows = th + 6  # stencil window: image rows [j*th-3, j*th+th+3)
    seq = seqs_ref[i]

    # Row coordinates, replicate-clamped (≡ golden's Gaussian border rule).
    ys = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + (j * th - 3)
    ys = jnp.clip(ys, 0, h - 1)

    yy, uu, vv = _wire_yuv_phases(seq, ys, w, h, q)
    B, G, R, GRAY = _decode_phases(yy, uu, vv)

    # ---- Gaussian 5×5: vertical taps then phase-decomposed horizontal ----
    # Valid blur centers: rows [-1, th+1) (window rows o+2±2 → o..o+4).
    gtmp = [_taps_rows(g_, _G5, th + 2, 0) for g_ in GRAY]
    left = gtmp[0][:, :1]
    right = gtmp[3][:, -1:]
    blur = [
        (acc + 128) >> 8 for acc in _conv_phases(gtmp, _G5, 2, left, right)
    ]  # P × (th+2, Q)

    # Global top/bottom edges: Sobel must see the *blurred* image replicated
    # (golden's second-stage border rule), not blur-of-replicated-input.
    for s in range(P):
        blur_scr[s][:, :] = blur[s]

    @pl.when(j == 0)
    def _():
        for s in range(P):
            blur_scr[s][0, :] = blur_scr[s][1, :]

    @pl.when(j == n_tiles - 1)
    def _():
        for s in range(P):
            blur_scr[s][rem + 1, :] = blur_scr[s][rem, :]

    bl = [blur_scr[s][:, :] for s in range(P)]

    # ---- Sobel (separable) on the blurred planes ----
    smooth = [_taps_rows(b_, (1, 2, 1), th, 0) for b_ in bl]
    diff = [_taps_rows(b_, (-1, 0, 1), th, 0) for b_ in bl]
    gx = _conv_phases(smooth, (-1, 0, 1), 1, smooth[0][:, :1], smooth[3][:, -1:])
    gy = _conv_phases(diff, (1, 2, 1), 1, diff[0][:, :1], diff[3][:, -1:])

    mag = []
    for s in range(P):
        m2 = gx[s] * gx[s] + gy[s] * gy[s]
        r_ = jnp.sqrt(m2.astype(jnp.float32)).astype(jnp.int32)
        r_ = jnp.where((r_ + 1) * (r_ + 1) <= m2, r_ + 1, r_)
        r_ = jnp.where(r_ * r_ > m2, r_ - 1, r_)
        mag.append(jnp.minimum(r_, 255))
    mag_out[0, :, :] = (
        mag[0] | (mag[1] << 8) | (mag[2] << 16) | (mag[3] << 24)
    ).astype(jnp.uint32)

    # ---- Rectangle overlay on the output BGR rows (tile rows [0, th)) ----
    rect_x = rects_ref[i, 0]
    rect_y = rects_ref[i, 1]
    rect_w = rects_ref[i, 2]
    rect_h = rects_ref[i, 3]
    thick = thick_ref[0]
    cb = colors_ref[i, 0]
    cg = colors_ref[i, 1]
    cr = colors_ref[i, 2]

    x_min = jnp.maximum(rect_x, 0)
    y_min = jnp.maximum(rect_y, 0)
    x_max = jnp.minimum(rect_x + rect_w, w)
    y_max = jnp.minimum(rect_y + rect_h, h)
    degenerate = (x_min >= x_max) | (y_min >= y_max)

    out_ys = jax.lax.broadcasted_iota(jnp.int32, (th, q), 0) + j * th
    y_span = (out_ys >= y_min) & (out_ys < y_max)
    top_bot = ((out_ys >= y_min) & (out_ys < y_min + thick)) | (
        (out_ys >= y_max - thick) & (out_ys < y_max)
    )

    Bo, Go, Ro = [], [], []
    for s in range(P):
        xs = jax.lax.broadcasted_iota(jnp.int32, (th, q), 1) * 4 + s
        x_span = (xs >= x_min) & (xs < x_max)
        left_right = ((xs >= x_min) & (xs < x_min + thick)) | (
            (xs >= x_max - thick) & (xs < x_max)
        )
        mask = ((x_span & top_bot) | (y_span & left_right)) & ~degenerate
        # Output BGR rows are window rows [3, th+3).
        Bo.append(jnp.where(mask, cb, B[s][3 : th + 3, :]))
        Go.append(jnp.where(mask, cg, G[s][3 : th + 3, :]))
        Ro.append(jnp.where(mask, cr, R[s][3 : th + 3, :]))

    # ---- Pack 12 bytes (4 px) per group into 3 little-endian u32 words ----
    # Emitted as three word-phase planes (Mosaic cannot lower the final
    # lane interleave; the host/byte view is a transpose — see wrapper).
    w0 = (Bo[0] | (Go[0] << 8) | (Ro[0] << 16) | (Bo[1] << 24)).astype(jnp.uint32)
    w1 = (Go[1] | (Ro[1] << 8) | (Bo[2] << 16) | (Go[2] << 24)).astype(jnp.uint32)
    w2 = (Ro[2] | (Bo[3] << 8) | (Go[3] << 16) | (Ro[3] << 24)).astype(jnp.uint32)
    bgr_out[0, 0, :, :] = w0
    bgr_out[0, 1, :, :] = w1
    bgr_out[0, 2, :, :] = w2


@partial(
    jax.jit, static_argnames=("width", "height", "tile_rows")
)
def fused_capture_pipeline(
    seqs: jax.Array,
    rects: jax.Array,
    rect_colors: jax.Array,
    thickness: jax.Array,
    *,
    width: int,
    height: int,
    tile_rows: int = 64,
):
    """Run the full fused tick for N simulated YUYV streams.

    Returns ``{"bgr_words": u32 [N, H, 3W/4], "mag_words": u32 [N, H, W/4]}``
    — little-endian byte views of packed-rows BGR and the |∇| map.
    """
    if width % 4 != 0:
        raise ValueError("mega-kernel requires width % 4 == 0")
    n = seqs.shape[0]
    q = width // 4
    th = min(_round_up(tile_rows, 8), _round_up(height, 8))
    n_tiles = -(-height // th)
    h_pad = n_tiles * th
    rem = height - (n_tiles - 1) * th

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n, n_tiles),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((1, 3, th, q), lambda i, j, *_: (i, 0, j, 0)),
            pl.BlockSpec((1, th, q), lambda i, j, *_: (i, j, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((th + 2, q), jnp.int32) for _ in range(P)],
    )

    bgr_wordplanes, mag_words = pl.pallas_call(
        partial(
            _kernel, th=th, w=width, h=height, n_tiles=n_tiles, rem=rem
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, h_pad, q), jnp.uint32),
            jax.ShapeDtypeStruct((n, h_pad, q), jnp.uint32),
        ),
        interpret=_interpret(),
    )(
        seqs.astype(jnp.int32),
        jnp.asarray(rects, jnp.int32),
        jnp.asarray(rect_colors, jnp.int32),
        jnp.asarray(thickness, jnp.int32).reshape(1),
    )
    return {
        "bgr_wordplanes": bgr_wordplanes[:, :, :height, :],
        "mag_words": mag_words[:, :height, :],
    }


def wordplanes_to_packed_numpy(wordplanes: "np.ndarray") -> "np.ndarray":
    """Host reassembly: (N, 3, H, Q) u32 word planes → (N, H, W, 3) u8."""
    import numpy as np

    n, three, h, q = wordplanes.shape
    assert three == 3
    # [n, h, q, word_phase] then little-endian byte view
    arr = np.ascontiguousarray(np.transpose(np.asarray(wordplanes), (0, 2, 3, 1)))
    return arr.view(np.uint8).reshape(n, h, q * 4, 3)


def mag_words_to_numpy(mag_words: "np.ndarray") -> "np.ndarray":
    """Host view: (N, H, Q) u32 → (N, H, W) u8 (little-endian bytes)."""
    import numpy as np

    n, h, q = mag_words.shape
    arr = np.ascontiguousarray(np.asarray(mag_words))
    return arr.view(np.uint8).reshape(n, h, q * 4)

"""Device Harris corner detection + non-max suppression.

BASELINE config 4 ("Harris corner detection + NMS on 1080p stream,
reduction-heavy feature path"). The reference has no feature detectors; the
corner spec is FROZEN as fixed-point int32 arithmetic in
:func:`golden.harris_response_i32` / :func:`golden.harris_corners` — the
device agrees bit-for-bit (array-equal masks and responses; no float
reassociation anywhere on the corner path). The float
:func:`harris_response` remains as a response-surface API (positional
parity only), spec :func:`golden.harris_response`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .filters import _taps, sobel3_gray

_GAUSS5_F = tuple(float(x) / 16.0 for x in (1, 4, 6, 4, 1))


def _smooth5_f32(m: jax.Array) -> jax.Array:
    tmp = _taps(m, -1, _GAUSS5_F, 2)
    return _taps(tmp, -2, _GAUSS5_F, 2)


@partial(jax.jit, static_argnames=("k",))
def harris_response(gray_u8: jax.Array, k: float = 0.04) -> jax.Array:
    """Harris response (..., H, W) float32; spec = golden.harris_response."""
    gx, gy = sobel3_gray(gray_u8)
    norm = jnp.float32(1.0 / (255.0 * 4.0))
    fx = gx.astype(jnp.float32) * norm
    fy = gy.astype(jnp.float32) * norm
    sxx = _smooth5_f32(fx * fx)
    syy = _smooth5_f32(fy * fy)
    sxy = _smooth5_f32(fx * fy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - jnp.float32(k) * tr * tr


_GAUSS5_I = (1, 4, 6, 4, 1)


def _smooth5_i32(m: jax.Array) -> jax.Array:
    """Separable integer 5×5 Gaussian, (Σ+128)>>8 (arithmetic shift)."""
    acc = _taps(_taps(m, -1, _GAUSS5_I, 2), -2, _GAUSS5_I, 2)
    return (acc + 128) >> 8


@partial(jax.jit, static_argnames=("k_num",))
def harris_response_i32(gray_u8: jax.Array, k_num: int = 41) -> jax.Array:
    """Fixed-point Harris response (..., H, W) int32 — bit-exact vs
    :func:`golden.harris_response_i32` (see there for the arithmetic and
    the i32 overflow-headroom proof)."""
    gx, gy = sobel3_gray(gray_u8)
    sxx5 = _smooth5_i32(gx * gx) >> 5
    syy5 = _smooth5_i32(gy * gy) >> 5
    sxy5 = _smooth5_i32(gx * gy) >> 5
    det = sxx5 * syy5 - sxy5 * sxy5
    trh = (sxx5 + syy5) >> 1
    return det - k_num * ((trh * trh) >> 8)


@partial(jax.jit, static_argnames=("k", "threshold_rel", "nms_radius"))
def harris_corners(
    gray_u8: jax.Array,
    k: float = 0.04,
    threshold_rel: float = 0.01,
    nms_radius: int = 1,
) -> jax.Array:
    """Boolean corner mask: response > t_num·(max>>12) AND (2r+1)² local
    maximum — integer throughout, array-equal with golden.harris_corners.

    The local-max test uses a max-pool (reduce_window) rather than golden's
    explicit shift loop — identical for ties because golden requires
    ``resp >= neighbor`` for all neighbors, i.e. resp == window max.
    Batched inputs reduce max over the spatial axes per image.
    """
    resp = harris_response_i32(gray_u8, k_num=int(round(k * 1024)))
    return _corner_mask(resp, threshold_rel, nms_radius)


import numpy as _np

_I32_MIN = _np.int32(-(2**31))  # np scalar: reduce_window needs a concrete init


def _corner_mask(resp: jax.Array, threshold_rel: float, nms_radius: int) -> jax.Array:
    spatial_max = jnp.max(resp, axis=(-2, -1), keepdims=True)
    t_num = int(round(threshold_rel * 4096))
    thresh = t_num * (spatial_max >> 12)

    win = 2 * nms_radius + 1
    dims = (1,) * (resp.ndim - 2) + (win, win)
    strides = (1,) * resp.ndim
    neigh_max = jax.lax.reduce_window(
        resp, _I32_MIN, jax.lax.max, dims, strides, padding="SAME"
    )
    return (resp > thresh) & (resp >= neigh_max)


@partial(jax.jit, static_argnames=("max_corners", "k", "threshold_rel", "nms_radius"))
def harris_corner_list(
    gray_u8: jax.Array,
    max_corners: int = 1024,
    k: float = 0.04,
    threshold_rel: float = 0.01,
    nms_radius: int = 1,
):
    """Top-K corner (y, x) coordinates + validity mask, static output shape.

    Data-dependent corner counts don't fit XLA's static shapes, so we return
    a fixed-size top-K by response with a mask — the jit-friendly contract.
    """
    resp = harris_response_i32(gray_u8, k_num=int(round(k * 1024)))
    mask = _corner_mask(resp, threshold_rel, nms_radius)  # shares resp
    h, w = resp.shape[-2], resp.shape[-1]
    scores = jnp.where(mask, resp, _I32_MIN).reshape(*resp.shape[:-2], h * w)
    top, idx = jax.lax.top_k(scores, max_corners)
    ys = idx // w
    xs = idx % w
    valid = top > _I32_MIN
    return jnp.stack([ys, xs], axis=-1), valid


@partial(jax.jit, static_argnames=("win", "iters"))
def corner_sub_pix(
    gray_u8: jax.Array, pts: jax.Array, win: int = 11, iters: int = 10
):
    """Sub-pixel corner refinement (OpenCV ``cornerSubPix``): for each
    corner q, solve Σ wᵢ ∇Iᵢ∇Iᵢᵀ (q − pᵢ) = 0 over a win×win window and
    iterate. Patch extraction is one dynamic_slice per point per
    iteration (the LK trick); all points refine in one vmapped program.

    ``pts``: [K, 2] float32 (x, y) → refined [K, 2] float32 (points whose
    window leaves the image are returned unrefined). Oracle:
    :func:`corner_sub_pix_numpy` (float64; device agrees to ~1e-3)."""
    h, w = gray_u8.shape
    half = win // 2
    a = gray_u8.astype(jnp.float32)
    off = jnp.arange(-half, half + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")
    # Gaussian-ish window weights (exp(-2 r²/half²), OpenCV's choice)
    wgt = jnp.exp(-2.0 * (ox * ox + oy * oy) / float(max(half, 1) ** 2))

    def patch(ty, tx, size):
        y0 = jnp.floor(ty)
        x0 = jnp.floor(tx)
        fy = ty - y0
        fx = tx - x0
        p = jax.lax.dynamic_slice(
            a,
            (y0.astype(jnp.int32), x0.astype(jnp.int32)),
            (size + 1, size + 1),
        )
        top = p[:size, :size] * (1 - fx) + p[:size, 1:] * fx
        bot = p[1:, :size] * (1 - fx) + p[1:, 1:] * fx
        return top * (1 - fy) + bot * fy

    def one(pt):
        def body(_, q):
            big = patch(q[1] - half - 1.0, q[0] - half - 1.0, win + 2)
            gx = (big[1:-1, 2:] - big[1:-1, :-2]) * 0.5
            gy = (big[2:, 1:-1] - big[:-2, 1:-1]) * 0.5
            axx = jnp.sum(wgt * gx * gx)
            axy = jnp.sum(wgt * gx * gy)
            ayy = jnp.sum(wgt * gy * gy)
            bx = jnp.sum(wgt * gx * (gx * ox + gy * oy))
            by = jnp.sum(wgt * gy * (gx * ox + gy * oy))
            det = axx * ayy - axy * axy
            inv = jnp.where(jnp.abs(det) > 1e-6, 1.0 / det, 0.0)
            dx = (ayy * bx - axy * by) * inv
            dy = (-axy * bx + axx * by) * inv
            return q + jnp.array([dx, dy], jnp.float32)

        ok = (
            (pt[0] - half - 1 >= 0) & (pt[0] + half + 1 <= w - 1)
            & (pt[1] - half - 1 >= 0) & (pt[1] + half + 1 <= h - 1)
        )
        refined = jax.lax.fori_loop(0, iters, body, pt)
        # reject divergence (> win shift) and out-of-window points
        moved = jnp.abs(refined - pt).max()
        return jnp.where(ok & (moved <= win), refined, pt)

    return jax.vmap(one)(pts)


def corner_sub_pix_numpy(
    gray: "np.ndarray", pts: "np.ndarray", win: int = 11, iters: int = 10
):
    """Float64 oracle for :func:`corner_sub_pix` (same algorithm: origin-
    clamped patches, gaussian window, gauss-newton updates)."""
    import numpy as np

    h, w = gray.shape
    half = win // 2
    a = gray.astype(np.float64)
    off = np.arange(-half, half + 1, dtype=np.float64)
    oy, ox = np.meshgrid(off, off, indexing="ij")
    wgt = np.exp(-2.0 * (ox * ox + oy * oy) / float(max(half, 1) ** 2))

    def patch(ty, tx, size):
        y0 = int(np.floor(ty))
        x0 = int(np.floor(tx))
        fy = ty - y0
        fx = tx - x0
        y0 = min(max(y0, 0), h - (size + 1))
        x0 = min(max(x0, 0), w - (size + 1))
        p = a[y0 : y0 + size + 1, x0 : x0 + size + 1]
        top = p[:size, :size] * (1 - fx) + p[:size, 1:] * fx
        bot = p[1:, :size] * (1 - fx) + p[1:, 1:] * fx
        return top * (1 - fy) + bot * fy

    out = np.array(pts, np.float64).reshape(-1, 2).copy()
    for k in range(len(out)):
        px, py = out[k]
        ok = (
            px - half - 1 >= 0 and px + half + 1 <= w - 1
            and py - half - 1 >= 0 and py + half + 1 <= h - 1
        )
        if not ok:
            continue
        q = out[k].copy()
        for _ in range(iters):
            big = patch(q[1] - half - 1.0, q[0] - half - 1.0, win + 2)
            gx = (big[1:-1, 2:] - big[1:-1, :-2]) * 0.5
            gy = (big[2:, 1:-1] - big[:-2, 1:-1]) * 0.5
            axx = (wgt * gx * gx).sum()
            axy = (wgt * gx * gy).sum()
            ayy = (wgt * gy * gy).sum()
            bx = (wgt * gx * (gx * ox + gy * oy)).sum()
            by = (wgt * gy * (gx * ox + gy * oy)).sum()
            det = axx * ayy - axy * axy
            if abs(det) <= 1e-6:
                break
            q = q + np.array(
                [(ayy * bx - axy * by) / det, (-axy * bx + axx * by) / det]
            )
        if np.abs(q - out[k]).max() <= win:
            out[k] = q
    return out.astype(np.float32)

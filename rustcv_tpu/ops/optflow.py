"""Pyramidal Lucas–Kanade sparse optical flow (calcOpticalFlowPyrLK).

TPU-native formulation: tracking is vectorized over the POINT axis with
``vmap`` — every level runs all points' gauss-newton iterations as one
fused program (patch sampling = bilinear gathers, the 2×2 normal system is
closed-form); the level loop is Python (per-level image shapes are
static). Pyramids use :func:`rustcv_tpu.ops.filters.pyr_down` (the frozen
5×5 Gaussian + decimate spec).

Float spec (float32 device / float64 oracle, tolerance-tested):
- patch gradients: central differences on the prev-image patch sampled at
  integer-offset grid around the (sub-pixel) point;
- iteration: v ← v + G⁻¹·b with G the gradient normal matrix and
  b = Σ δI·∇I over the window; level-to-level: g ← 2(g + v);
- status 0 when the point (window) leaves the image at any level or
  det(G)/win² falls under ``min_eig``-style threshold (1e-4 · win²·255²).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .filters import pyr_down


def _build_pyramid(img: jax.Array, levels: int):
    pyr = [img.astype(jnp.float32)]
    cur = img
    for _ in range(levels):
        cur = pyr_down(cur, has_channels=False)
        pyr.append(cur.astype(jnp.float32))
    return pyr


def _sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinear sample (float coords, clamped) — img [H, W] f32."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    i00 = img[y0i, x0i]
    i01 = img[y0i, x0i + 1]
    i10 = img[y0i + 1, x0i]
    i11 = img[y0i + 1, x0i + 1]
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def _track_level(prev_l, next_l, pts_l, guess, half: int, iters: int):
    """One pyramid level for ALL points: returns (v, ok) [N,2], [N]."""
    h, w = prev_l.shape
    off = jnp.arange(-half, half + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(off, off, indexing="ij")

    def one(pt, g):
        cy = pt[1]
        cx = pt[0]
        ys = cy + oy
        xs = cx + ox
        t = _sample(prev_l, ys, xs)
        # central-difference gradients of the prev patch (sampled ±1)
        ix = (_sample(prev_l, ys, xs + 1.0) - _sample(prev_l, ys, xs - 1.0)) * 0.5
        iy = (_sample(prev_l, ys + 1.0, xs) - _sample(prev_l, ys - 1.0, xs)) * 0.5
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        n = (2 * half + 1) ** 2
        ok_g = det / n > 1e-4 * n  # texture threshold
        inv = jnp.where(det != 0, 1.0 / jnp.maximum(jnp.abs(det), 1e-20), 0.0)
        inv = inv * jnp.sign(det)

        def body(_, v):
            nys = cy + g[1] + v[1] + oy
            nxs = cx + g[0] + v[0] + ox
            di = _sample(next_l, nys, nxs) - t
            bx = jnp.sum(di * ix)
            by = jnp.sum(di * iy)
            dx = -(gyy * bx - gxy * by) * inv
            dy = -(-gxy * bx + gxx * by) * inv
            return v + jnp.array([dx, dy], jnp.float32)

        v = jax.lax.fori_loop(0, iters, body, jnp.zeros(2, jnp.float32))
        fin = jnp.array([cx + g[0] + v[0], cy + g[1] + v[1]])
        inb = (
            (cx - half >= 0) & (cx + half <= w - 1)
            & (cy - half >= 0) & (cy + half <= h - 1)
            & (fin[0] >= 0) & (fin[0] <= w - 1)
            & (fin[1] >= 0) & (fin[1] <= h - 1)
        )
        return v, ok_g, inb

    return jax.vmap(one)(pts_l, guess)


@partial(jax.jit, static_argnames=("win", "levels", "iters"))
def calc_optical_flow_pyr_lk(
    prev_gray: jax.Array,
    next_gray: jax.Array,
    pts: jax.Array,
    win: int = 21,
    levels: int = 3,
    iters: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Track ``pts`` [N, 2] float32 (x, y) from ``prev_gray`` to
    ``next_gray`` (u8 [H, W]). Returns (next_pts [N, 2] float32,
    status [N] bool). ``win`` must be odd."""
    half = win // 2
    pp = _build_pyramid(prev_gray, levels)
    np_ = _build_pyramid(next_gray, levels)
    n = pts.shape[0]
    g = jnp.zeros((n, 2), jnp.float32)
    ok_all = jnp.ones(n, bool)
    for lvl in range(levels, -1, -1):
        scale = float(2**lvl)
        pts_l = pts / scale
        v, ok_tex, inb = _track_level(pp[lvl], np_[lvl], pts_l, g, half, iters)
        # Texture gates at every level; the window-in-bounds test only at
        # the FINEST level — coarse-level windows legitimately overhang
        # small pyramid images (samples clamp), as in OpenCV.
        ok_all = ok_all & ok_tex
        if lvl == 0:
            ok_all = ok_all & inb
        if lvl > 0:
            g = 2.0 * (g + v)
        else:
            g = g + v
    next_pts = pts + g
    return next_pts, ok_all


# ---------------------------------------------------------------------------
# NumPy oracle (float64, same algorithm)
# ---------------------------------------------------------------------------


def _pyr_down_np(img: np.ndarray) -> np.ndarray:
    from . import golden

    return golden.pyr_down(img)


def _sample_np(img, ys, xs):
    h, w = img.shape
    x0 = np.clip(np.floor(xs), 0, w - 2)
    y0 = np.clip(np.floor(ys), 0, h - 2)
    fx = np.clip(xs - x0, 0.0, 1.0)
    fy = np.clip(ys - y0, 0.0, 1.0)
    x0 = x0.astype(np.int64)
    y0 = y0.astype(np.int64)
    top = img[y0, x0] * (1 - fx) + img[y0, x0 + 1] * fx
    bot = img[y0 + 1, x0] * (1 - fx) + img[y0 + 1, x0 + 1] * fx
    return top * (1 - fy) + bot * fy


def calc_optical_flow_pyr_lk_numpy(
    prev_gray: np.ndarray,
    next_gray: np.ndarray,
    pts: np.ndarray,
    win: int = 21,
    levels: int = 3,
    iters: int = 10,
):
    half = win // 2
    pp = [prev_gray.astype(np.float64)]
    nn = [next_gray.astype(np.float64)]
    cp, cn = prev_gray, next_gray
    for _ in range(levels):
        cp = _pyr_down_np(cp)
        cn = _pyr_down_np(cn)
        pp.append(cp.astype(np.float64))
        nn.append(cn.astype(np.float64))
    off = np.arange(-half, half + 1, dtype=np.float64)
    oy, ox = np.meshgrid(off, off, indexing="ij")
    n_pts = pts.shape[0]
    g = np.zeros((n_pts, 2))
    ok_all = np.ones(n_pts, bool)
    n = win * win
    for lvl in range(levels, -1, -1):
        prev_l, next_l = pp[lvl], nn[lvl]
        h, w = prev_l.shape
        for i in range(n_pts):
            cx, cy = pts[i] / (2.0**lvl)
            ys, xs = cy + oy, cx + ox
            t = _sample_np(prev_l, ys, xs)
            ix = (_sample_np(prev_l, ys, xs + 1) - _sample_np(prev_l, ys, xs - 1)) * 0.5
            iy = (_sample_np(prev_l, ys + 1, xs) - _sample_np(prev_l, ys - 1, xs)) * 0.5
            gxx, gxy, gyy = (ix * ix).sum(), (ix * iy).sum(), (iy * iy).sum()
            det = gxx * gyy - gxy * gxy
            ok = det / n > 1e-4 * n
            v = np.zeros(2)
            if det != 0:
                for _ in range(iters):
                    di = _sample_np(next_l, cy + g[i, 1] + v[1] + oy, cx + g[i, 0] + v[0] + ox) - t
                    bx, by = (di * ix).sum(), (di * iy).sum()
                    v += np.array([-(gyy * bx - gxy * by), -(-gxy * bx + gxx * by)]) / det
            fx_, fy_ = cx + g[i, 0] + v[0], cy + g[i, 1] + v[1]
            inb = (
                cx - half >= 0 and cx + half <= w - 1
                and cy - half >= 0 and cy + half <= h - 1
                and 0 <= fx_ <= w - 1 and 0 <= fy_ <= h - 1
            )
            ok_all[i] &= bool(ok) and (bool(inb) or lvl > 0)
            g[i] = 2.0 * (g[i] + v) if lvl > 0 else g[i] + v
    return (pts + g).astype(np.float64), ok_all

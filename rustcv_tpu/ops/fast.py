"""FAST corner detector (features2d parity) — pure elementwise on TPU.

FAST-N on the 16-pixel Bresenham ring: a pixel is a corner when ≥ N
contiguous ring pixels are all brighter than center+t or all darker than
center−t. The TPU formulation has no per-pixel loops: the 16 ring views
are static shifts of the image, the two 16-bit ring masks live as int32
lanes, and "N contiguous (circularly)" reduces by the rotate-AND trick —
AND of N−1 successive rotations is nonzero iff some run of length N
exists. Score = Σ|ring − center| over the passing arc's direction
(a simple frozen spec; OpenCV's score differs), NMS 3×3 like Harris.

Frozen spec (exact integer): brighter = ring > c + t, darker = ring <
c − t; border of 3 pixels never fires; non-max suppression on the score.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

# Bresenham circle radius 3, clockwise from 12 o'clock: (dy, dx).
RING = [
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
]


def _rot16(m, k):
    """Circular left-rotation of a 16-bit lane mask by k."""
    return ((m << k) | (m >> (16 - k))) & 0xFFFF


def _has_run(mask, n):
    """True where the 16-bit circular mask contains a run of n ones."""
    acc = mask
    for k in range(1, n):
        acc = acc & _rot16(mask, k)
    return acc != 0


def _shift(img, dy, dx):
    """Image shifted so out[y, x] = img[y+dy, x+dx] (zero-pad borders —
    the 3-px border is masked off anyway)."""
    h, w = img.shape[-2], img.shape[-1]
    out = jnp.zeros_like(img)
    ys = slice(max(dy, 0), h + min(dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[..., yd, xd].set(img[..., ys, xs])


@partial(jax.jit, static_argnames=("threshold", "n", "nms"))
def fast_response(gray_u8: jax.Array, threshold: int = 20, n: int = 9,
                  nms: bool = True):
    """u8 gray (H, W) → (corner mask bool, score int32) — FAST-n."""
    c = gray_u8.astype(jnp.int32)
    rings = [_shift(c, dy, dx) for dy, dx in RING]
    bright = jnp.zeros_like(c)
    dark = jnp.zeros_like(c)
    score_b = jnp.zeros_like(c)
    score_d = jnp.zeros_like(c)
    for i, r in enumerate(rings):
        bright = bright | ((r > c + threshold).astype(jnp.int32) << i)
        dark = dark | ((r < c - threshold).astype(jnp.int32) << i)
        score_b = score_b + jnp.maximum(r - c - threshold, 0)
        score_d = score_d + jnp.maximum(c - threshold - r, 0)
    is_b = _has_run(bright, n)
    is_d = _has_run(dark, n)
    score = jnp.where(is_b, score_b, 0) + jnp.where(is_d, score_d, 0)
    corner = is_b | is_d
    # 3-px border never fires (incomplete rings read zero-padding)
    h, w = c.shape[-2], c.shape[-1]
    yy = jax.lax.broadcasted_iota(jnp.int32, c.shape, c.ndim - 2)
    xx = jax.lax.broadcasted_iota(jnp.int32, c.shape, c.ndim - 1)
    inb = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    corner = corner & inb
    score = jnp.where(corner, score, 0)
    if nms:
        neigh = score
        best = score
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                best = jnp.maximum(best, _shift(neigh, dy, dx))
        corner = corner & (score >= best) & (score > 0)
    return corner, score


@partial(jax.jit, static_argnames=("threshold", "n", "max_corners", "nms"))
def fast_corner_list(
    gray_u8: jax.Array,
    threshold: int = 20,
    n: int = 9,
    max_corners: int = 1024,
    nms: bool = True,
):
    """Top-K FAST corners: ([K, 2] (y, x) int32, valid bool[K]) — the same
    static-shape contract as harris_corner_list."""
    corner, score = fast_response(gray_u8, threshold, n, nms)
    h, w = gray_u8.shape[-2], gray_u8.shape[-1]
    flat = jnp.where(corner, score, -1).reshape(h * w)
    top, idx = jax.lax.top_k(flat, max_corners)
    return jnp.stack([idx // w, idx % w], axis=-1), top > 0


# ---------------------------------------------------------------------------
# NumPy oracle (same frozen spec)
# ---------------------------------------------------------------------------


def fast_corners_numpy(gray: np.ndarray, threshold: int = 20, n: int = 9,
                       nms: bool = True):
    c = gray.astype(np.int64)
    h, w = c.shape
    bright = np.zeros((h, w), np.int64)
    dark = np.zeros((h, w), np.int64)
    sb = np.zeros((h, w), np.int64)
    sd = np.zeros((h, w), np.int64)
    for i, (dy, dx) in enumerate(RING):
        r = np.zeros_like(c)
        ys = slice(max(dy, 0), h + min(dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        yd = slice(max(-dy, 0), h + min(-dy, 0))
        xd = slice(max(-dx, 0), w + min(-dx, 0))
        r[yd, xd] = c[ys, xs]
        bright |= (r > c + threshold).astype(np.int64) << i
        dark |= (r < c - threshold).astype(np.int64) << i
        sb += np.maximum(r - c - threshold, 0)
        sd += np.maximum(c - threshold - r, 0)

    def run(mask):
        acc = mask.copy()
        for k in range(1, n):
            rot = ((mask << k) | (mask >> (16 - k))) & 0xFFFF
            acc &= rot
        return acc != 0

    is_b = run(bright)
    is_d = run(dark)
    score = np.where(is_b, sb, 0) + np.where(is_d, sd, 0)
    corner = is_b | is_d
    corner[:3] = corner[-3:] = False
    corner[:, :3] = corner[:, -3:] = False
    score = np.where(corner, score, 0)
    if nms:
        best = score.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                shifted = np.zeros_like(score)
                ys = slice(max(dy, 0), h + min(dy, 0))
                xs = slice(max(dx, 0), w + min(dx, 0))
                yd = slice(max(-dy, 0), h + min(-dy, 0))
                xd = slice(max(-dx, 0), w + min(-dx, 0))
                shifted[yd, xd] = score[ys, xs]
                best = np.maximum(best, shifted)
        corner = corner & (score >= best) & (score > 0)
    return corner, score

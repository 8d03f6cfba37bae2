"""Device Harris corner detection + non-max suppression.

BASELINE config 4 ("Harris corner detection + NMS on 1080p stream,
reduction-heavy feature path"). The reference has no feature detectors; the
spec is frozen in :func:`golden.harris_response` / :func:`golden.harris_corners`.

Gradients and their products are integer (exact); the windowed second-moment
matrix and the response are float32 — float reassociation means device vs
NumPy agreement is positional (corner sets), not bitwise. Tests assert corner
sets match under a small response tolerance.
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


@partial(jax.jit, static_argnames=("k", "threshold_rel", "nms_radius"))
def harris_corners(
    gray_u8: jax.Array,
    k: float = 0.04,
    threshold_rel: float = 0.01,
    nms_radius: int = 1,
) -> jax.Array:
    """Boolean corner mask: response > rel·max AND (2r+1)² local maximum.

    The local-max test uses a max-pool (reduce_window) rather than golden's
    explicit shift loop — mathematically identical for ties because golden
    requires ``resp >= neighbor`` for all neighbors, i.e. resp == window max.
    Batched inputs reduce max over the spatial axes per image.
    """
    resp = harris_response(gray_u8, k=k)
    return _corner_mask(resp, threshold_rel, nms_radius)


def _corner_mask(resp: jax.Array, threshold_rel: float, nms_radius: int) -> jax.Array:
    spatial_max = jnp.max(resp, axis=(-2, -1), keepdims=True)
    thresh = jnp.float32(threshold_rel) * spatial_max

    win = 2 * nms_radius + 1
    dims = (1,) * (resp.ndim - 2) + (win, win)
    strides = (1,) * resp.ndim
    neigh_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, dims, strides, padding="SAME"
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
    resp = harris_response(gray_u8, k=k)
    mask = _corner_mask(resp, threshold_rel, nms_radius)  # shares resp
    h, w = resp.shape[-2], resp.shape[-1]
    scores = jnp.where(mask, resp, -jnp.inf).reshape(*resp.shape[:-2], h * w)
    top, idx = jax.lax.top_k(scores, max_corners)
    ys = idx // w
    xs = idx % w
    valid = top > -jnp.inf
    return jnp.stack([ys, xs], axis=-1), valid

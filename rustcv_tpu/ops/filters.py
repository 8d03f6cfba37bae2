"""Device stencil filters — Gaussian blur, Sobel, gradient magnitude.

Bit-exact vs :mod:`golden` (integer taps implemented as shifted adds, which
XLA fuses into a single elementwise DAG — no convolution primitive needed for
5-tap kernels, and integer convs aren't MXU-friendly anyway). Works on
(H, W), (H, W, C) or batched (..., H, W[, C]) arrays; the two spatial axes
are identified by the ``hw_axes`` convention: they are the last two axes for
gray input, axes (-3, -2) when a channel axis is present.

Specs frozen in golden.py (the reference has no filters; BASELINE configs
2–4 demand them).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

GAUSS5 = (1, 4, 6, 4, 1)  # per-axis taps, sum 16


def _replicate_pad(a: jax.Array, axis: int, r: int) -> jax.Array:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (r, r)
    return jnp.pad(a, pad, mode="edge")


def _taps(a: jax.Array, axis: int, weights, r: int):
    """Σ w_k · shift_k(a) along ``axis`` with replicate border, int32."""
    p = _replicate_pad(a, axis, r)
    n = a.shape[axis]
    acc = None
    for k, w in enumerate(weights):
        if w == 0:
            continue
        sl = jax.lax.slice_in_dim(p, k, k + n, axis=axis)
        term = w * sl if w != 1 else sl
        acc = term if acc is None else acc + term
    return acc


def _spatial_axes(x: jax.Array, has_channels: bool):
    return (-3, -2) if has_channels else (-2, -1)


@partial(jax.jit, static_argnames=("has_channels",))
def gaussian5_u8(img: jax.Array, has_channels: bool = None) -> jax.Array:  # type: ignore[assignment]
    """5×5 Gaussian on u8, replicate border, (Σ+128)>>8 — exact vs golden."""
    if has_channels is None:
        has_channels = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    ax_h, ax_w = _spatial_axes(img, has_channels)
    a = img.astype(jnp.int32)
    tmp = _taps(a, ax_w, GAUSS5, 2)
    acc = _taps(tmp, ax_h, GAUSS5, 2)
    return ((acc + 128) >> 8).astype(jnp.uint8)


@jax.jit
def sobel3_gray(gray: jax.Array):
    """Sobel gx/gy on u8 gray (..., H, W) → int32 pair, exact vs golden."""
    a = gray.astype(jnp.int32)
    ax_h, ax_w = -2, -1
    smooth_v = _taps(a, ax_h, (1, 2, 1), 1)
    diff_v = _taps(a, ax_h, (-1, 0, 1), 1)
    gx = _taps(smooth_v, ax_w, (-1, 0, 1), 1)
    gy = _taps(diff_v, ax_w, (1, 2, 1), 1)
    return gx, gy


@jax.jit
def isqrt_exact(x: jax.Array) -> jax.Array:
    """Exact floor-sqrt of non-negative int32 (≤ ~2.1e9 via f32 + fix-up)."""
    xf = x.astype(jnp.float32)
    s = jnp.sqrt(xf).astype(jnp.int32)
    # TPU f32 sqrt may be off by an ULP; two monotone fix-ups restore floor.
    s = jnp.where((s + 1) * (s + 1) <= x, s + 1, s)
    s = jnp.where(s * s > x, s - 1, s)
    return s


@jax.jit
def gradient_magnitude_u8(gx: jax.Array, gy: jax.Array) -> jax.Array:
    """min(255, isqrt(gx²+gy²)). gx,gy ≤ 1020 ⇒ gx²+gy² ≤ 2.08e6, fits i32."""
    mag2 = gx * gx + gy * gy
    return jnp.minimum(isqrt_exact(mag2), 255).astype(jnp.uint8)


@jax.jit
def blur_sobel_mag_u8(img_bgr: jax.Array) -> jax.Array:
    """Fused BASELINE config-3 pipeline: gray → Gaussian5 → Sobel → |∇|.

    One jitted program; XLA fuses the whole integer DAG into a few kernels.
    """
    from .color import bgr_to_gray

    gray = bgr_to_gray(img_bgr)
    blurred = gaussian5_u8(gray, has_channels=False)
    gx, gy = sobel3_gray(blurred)
    return gradient_magnitude_u8(gx, gy)


@partial(jax.jit, static_argnames=("type",))
def threshold_u8(img: jax.Array, thresh: jax.Array, maxval: jax.Array, type: str = "binary") -> jax.Array:
    """Element-wise threshold, bit-exact vs golden.threshold; thresh/maxval
    are traced (changing them never recompiles)."""
    a = img.astype(jnp.int32)
    thresh = jnp.asarray(thresh, jnp.int32)
    maxval = jnp.asarray(maxval, jnp.int32)
    above = a > thresh
    if type == "binary":
        out = jnp.where(above, maxval, 0)
    elif type == "binary_inv":
        out = jnp.where(above, 0, maxval)
    elif type == "trunc":
        out = jnp.where(above, thresh, a)
    elif type == "tozero":
        out = jnp.where(above, a, 0)
    elif type == "tozero_inv":
        out = jnp.where(above, 0, a)
    else:
        raise ValueError(f"unknown threshold type {type!r}")
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("ksize",))
def box_blur_u8(img: jax.Array, ksize: int = 3) -> jax.Array:
    """Box blur k×k (odd k), replicate border, rounded integer mean."""
    r = ksize // 2
    has_channels = img.ndim >= 3 and img.shape[-1] in (1, 3, 4)
    ax_h, ax_w = _spatial_axes(img, has_channels)
    a = img.astype(jnp.int32)
    ones = (1,) * ksize
    tmp = _taps(a, ax_w, ones, r)
    acc = _taps(tmp, ax_h, ones, r)
    n = ksize * ksize
    return ((acc + n // 2) // n).astype(jnp.uint8)

"""Device bilinear resize — fixed-point, bit-exact vs golden.resize_bilinear.

Coefficient tables (source indices + 11-bit weights) are computed on the host
in float64 (:func:`golden.resize_coeffs`) and baked into the jitted program as
constants per (src, dst) shape pair; the device does pure int32 gather+lerp.
Separable: horizontal gathers keep unshifted 11-bit sums, vertical pass
rounds once with ``(Σ + 2²¹) >> 22``. Gathers along an axis lower to XLA
``gather``/``take`` which TPU handles well for contiguous lanes.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import golden


@lru_cache(maxsize=128)
def _tables(src: int, dst: int):
    lo, w_hi = golden.resize_coeffs(src, dst)
    hi = np.minimum(lo + 1, src - 1)
    return (
        jnp.asarray(lo, jnp.int32),
        jnp.asarray(hi, jnp.int32),
        jnp.asarray(w_hi, jnp.int32),
    )


@partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_bilinear(img: jax.Array, dst_w: int, dst_h: int) -> jax.Array:
    """Resize (..., H, W, C) u8 → (..., dst_h, dst_w, C) u8."""
    src_h, src_w = img.shape[-3], img.shape[-2]
    x_lo, x_hi, x_whi = _tables(src_w, dst_w)
    y_lo, y_hi, y_whi = _tables(src_h, dst_h)
    one = golden.RESIZE_ONE

    a = img.astype(jnp.int32)
    # Horizontal (axis -2)
    lo = jnp.take(a, x_lo, axis=-2)
    hi = jnp.take(a, x_hi, axis=-2)
    wx = x_whi[:, None]
    tmp = lo * (one - wx) + hi * wx
    # Vertical (axis -3)
    lo = jnp.take(tmp, y_lo, axis=-3)
    hi = jnp.take(tmp, y_hi, axis=-3)
    wy = y_whi[:, None, None]
    acc = lo * (one - wy) + hi * wy
    out = (acc + (1 << (2 * golden.RESIZE_SHIFT - 1))) >> (2 * golden.RESIZE_SHIFT)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)

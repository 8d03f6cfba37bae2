"""Device (TPU/XLA) color conversions — bit-exact vs :mod:`golden`.

All arithmetic is int32 with explicit shifts/clamps so XLA cannot reassociate
into anything that changes u8 results (SURVEY.md §7 hard-part #2). Every
function accepts either a single frame or a leading batch dimension — shapes
are static under ``jit`` and the batch axis is the natural sharding axis for
multi-chip execution (``parallel/mesh.py``).

Reference formulas: ``rustcv-camera/src/decode.rs:160-219``,
``rustcv/src/videoio/mod.rs:344-399`` (see golden.py for the exact spec).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bt601(y, u, v):
    """BT.601 integer kernel; y/u/v int32, returns u8 stacked BGR last-axis."""
    c = y - 16
    d = u - 128
    e = v - 128
    b = (298 * c + 516 * d + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    r = (298 * c + 409 * e + 128) >> 8
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("width", "height"))
def yuyv_to_bgr(src: jax.Array, width: int, height: int) -> jax.Array:
    """YUYV packed 4:2:2 → BGR u8.

    ``src``: u8, shape (..., height*width*2) flat or (..., H, W*2);
    returns (..., H, W, 3).
    """
    batch = src.shape[:-1] if src.ndim > 1 and src.shape[-1] == height * width * 2 else src.shape[:-2]
    m = src.reshape(*batch, height, width // 2, 4).astype(jnp.int32)
    y0, u, y1, v = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
    y = jnp.stack([y0, y1], axis=-1)  # (..., H, W/2, 2)
    u2 = jnp.broadcast_to(u[..., None], y.shape)
    v2 = jnp.broadcast_to(v[..., None], y.shape)
    return _bt601(y, u2, v2).reshape(*batch, height, width, 3)


@partial(jax.jit, static_argnames=("width", "height"))
def uyvy_to_bgr(src: jax.Array, width: int, height: int) -> jax.Array:
    batch = src.shape[:-1] if src.ndim > 1 and src.shape[-1] == height * width * 2 else src.shape[:-2]
    m = src.reshape(*batch, height, width // 2, 4).astype(jnp.int32)
    u, y0, v, y1 = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
    y = jnp.stack([y0, y1], axis=-1)
    u2 = jnp.broadcast_to(u[..., None], y.shape)
    v2 = jnp.broadcast_to(v[..., None], y.shape)
    return _bt601(y, u2, v2).reshape(*batch, height, width, 3)


@partial(jax.jit, static_argnames=("width", "height"))
def nv12_to_bgr(src: jax.Array, width: int, height: int) -> jax.Array:
    """NV12 planar → BGR u8. ``src``: u8 flat (..., H*W*3//2)."""
    batch = src.shape[:-1]
    flat = src.reshape(*batch, height * width * 3 // 2)
    y = flat[..., : height * width].astype(jnp.int32).reshape(*batch, height, width)
    uv = flat[..., height * width :].astype(jnp.int32).reshape(*batch, height // 2, width // 2, 2)
    u = jnp.repeat(jnp.repeat(uv[..., 0], 2, axis=-2), 2, axis=-1)
    v = jnp.repeat(jnp.repeat(uv[..., 1], 2, axis=-2), 2, axis=-1)
    return _bt601(y, u, v)


@partial(jax.jit, static_argnames=("width", "height"))
def bgra_to_bgr(src: jax.Array, width: int, height: int) -> jax.Array:
    batch = src.shape[:-1]
    m = src.reshape(*batch, height, width, 4)
    return m[..., :3]


@partial(jax.jit, static_argnames=("width", "height"))
def rgba_to_bgr(src: jax.Array, width: int, height: int) -> jax.Array:
    batch = src.shape[:-1]
    m = src.reshape(*batch, height, width, 4)
    return m[..., jnp.array([2, 1, 0])]


@partial(jax.jit, static_argnames=("width", "height"))
def rgb_to_bgr(src: jax.Array, width: int, height: int) -> jax.Array:
    batch = src.shape[:-1]
    m = src.reshape(*batch, height, width, 3)
    return m[..., ::-1]


@jax.jit
def bgr_to_gray(bgr: jax.Array) -> jax.Array:
    """(77R + 150G + 29B + 128) >> 8, exact vs golden.bgr_to_gray."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    return ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(jnp.uint8)

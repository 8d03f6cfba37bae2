"""Template matching — normalized cross-correlation as MXU convolutions.

OpenCV ``matchTemplate`` parity for the common methods, TPU-native: all
three window statistics (cross-correlation, window sum, window sum of
squares) are `lax.conv` calls — systolic-array work, not sliding loops.

Frozen spec (float32 device / float64 oracle, tolerance-tested like
Harris):

- ``ccoeff_normed``: R = Σ(T′·W) / √(ΣT′² · Σ(W−mean(W))²) with
  T′ = T − mean(T); degenerate windows (zero variance on either side) → 0.
- ``ccorr_normed``:  R = Σ(T·W) / √(ΣT² · ΣW²); zero denominators → 0.
- ``sqdiff``:        R = Σ(T−W)² = ΣT² − 2Σ(T·W) + ΣW².

Output shape (H−th+1, W−tw+1), peak (ccoeff/ccorr: max; sqdiff: min) at
the template's top-left corner.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

METHODS = ("ccoeff_normed", "ccorr_normed", "sqdiff")


def _rows_as_channels(img_f32: jax.Array, th: int) -> jax.Array:
    """[H, W] → conv lhs [1, th, H−th+1, W]: channel i is the image shifted
    down by i rows. Turns the single-channel 2-D correlation into a conv
    with a th·tw-deep contraction — an im2col matmul the MXU can tile. The
    naive 1-feature spatial conv measured 2 GFLOP/s on TPU (scalar-ish
    lowering); this form reaches the hundreds-of-GFLOP/s class."""
    hp = img_f32.shape[0] - th + 1
    return jnp.stack(
        [jax.lax.slice_in_dim(img_f32, i, i + hp, axis=0) for i in range(th)],
        axis=0,
    )[None]


def _conv_rows(lhs: jax.Array, kernels: jax.Array) -> jax.Array:
    """lhs [1, th, H', W] × kernels [k, th, tw] → [k, H', W−tw+1]."""
    rhs = kernels[:, :, None, :]  # [k, th, 1, tw]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


@partial(jax.jit, static_argnames=("method",))
def match_template(
    img: jax.Array, tmpl: jax.Array, method: str = "ccoeff_normed"
) -> jax.Array:
    """u8 grayscale image (H, W) × template (th, tw) → float32 response map
    (H−th+1, W−tw+1)."""
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r} (one of {METHODS})")
    a = img.astype(jnp.float32)
    t = tmpl.astype(jnp.float32)
    th = t.shape[0]
    n = float(t.shape[0] * t.shape[1])
    ones = jnp.ones(t.shape, jnp.float32)
    lhs = _rows_as_channels(a, th)
    if method == "sqdiff":
        cross = _conv_rows(lhs, jnp.stack([t]))[0]
        s2 = _conv_rows(lhs * lhs, jnp.stack([ones]))[0]
        return s2 - 2.0 * cross + jnp.sum(t * t)
    if method == "ccorr_normed":
        cross = _conv_rows(lhs, jnp.stack([t]))[0]
        s2 = _conv_rows(lhs * lhs, jnp.stack([ones]))[0]
        denom = jnp.sqrt(s2 * jnp.sum(t * t))
        return jnp.where(denom > 0, cross / jnp.maximum(denom, 1e-20), 0.0)
    # ccoeff_normed — one 2-feature conv (Σ T′·W and Σ W) + one for Σ W².
    tp = t - jnp.mean(t)
    cs = _conv_rows(lhs, jnp.stack([tp, ones]))
    cross, s1 = cs[0], cs[1]  # ΣT′ = 0 ⇒ cross is already mean-free
    s2 = _conv_rows(lhs * lhs, jnp.stack([ones]))[0]
    win_var = s2 - s1 * s1 / n  # Σ(W − mean W)²
    denom = jnp.sqrt(jnp.maximum(win_var, 0.0) * jnp.sum(tp * tp))
    return jnp.where(denom > 1e-6, cross / jnp.maximum(denom, 1e-20), 0.0)


def min_max_loc(resp) -> Tuple[float, float, Tuple[int, int], Tuple[int, int]]:
    """(min_val, max_val, (min_x, min_y), (max_x, max_y)) of a 2-D response
    (OpenCV ``minMaxLoc`` — locations are (x, y))."""
    a = np.asarray(resp)
    imin = int(np.argmin(a))
    imax = int(np.argmax(a))
    w = a.shape[1]
    return (
        float(a.flat[imin]),
        float(a.flat[imax]),
        (imin % w, imin // w),
        (imax % w, imax // w),
    )


# ---------------------------------------------------------------------------
# NumPy oracle (float64 — tolerance-tested like Harris)
# ---------------------------------------------------------------------------


def match_template_numpy(
    img: np.ndarray, tmpl: np.ndarray, method: str = "ccoeff_normed"
) -> np.ndarray:
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}")
    a = img.astype(np.float64)
    t = tmpl.astype(np.float64)
    th, tw = t.shape
    win = np.lib.stride_tricks.sliding_window_view(a, (th, tw))
    n = th * tw
    if method == "sqdiff":
        return np.einsum("hwij,hwij->hw", win - t, win - t)
    if method == "ccorr_normed":
        cross = np.einsum("hwij,ij->hw", win, t)
        denom = np.sqrt(np.einsum("hwij,hwij->hw", win, win) * np.sum(t * t))
        return np.where(denom > 0, cross / np.maximum(denom, 1e-300), 0.0)
    tp = t - t.mean()
    cross = np.einsum("hwij,ij->hw", win, tp)
    s1 = np.einsum("hwij->hw", win)
    s2 = np.einsum("hwij,hwij->hw", win, win)
    win_var = s2 - s1 * s1 / n
    denom = np.sqrt(np.maximum(win_var, 0.0) * np.sum(tp * tp))
    return np.where(denom > 1e-6, cross / np.maximum(denom, 1e-300), 0.0)

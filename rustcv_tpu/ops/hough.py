"""Standard Hough line transform — accumulator as one-hot matmuls.

The classical accumulator is a scatter (hostile on TPU); here each theta's
rho-histogram is an MXU contraction instead:

1. edge pixels compact to a static-size coordinate list (top_k over the
   edge mask — the jit-friendly contract, like harris_corner_list);
2. for every theta, rho = x·cosθ + y·sinθ quantizes to ``rho_bins``; the
   12-bit bin splits into two 64-wide one-hots and a batched einsum
   ``[T, N, 64] × [T, N, 64] → [T, 64, 64]`` accumulates all votes —
   exact integer counts in f32 (N < 2^24);
3. peaks: threshold + 3×3 NMS on the (theta, rho) accumulator, top-K.

Returns OpenCV-style (rho, theta) pairs. Frozen spec: float32 cos/sin
tables from float64, round-half-even bin quantization.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=("n_thetas", "rho_bins", "max_points", "max_lines"),
)
def hough_lines(
    edges: jax.Array,
    n_thetas: int = 180,
    rho_bins: int = 2048,
    max_points: int = 65536,
    max_lines: int = 32,
    threshold: int = 50,
):
    """Binary edge mask (H, W) u8 → (lines [max_lines, 2] float32
    (rho, theta-radians), valid bool, votes int32).

    ``rho`` spans [−D, D] (D = image diagonal) over ``rho_bins`` bins;
    thetas cover [0, π). Edge points beyond ``max_points`` are dropped
    (strongest-first is meaningless for a binary mask — raster order)."""
    h, w = edges.shape
    diag = float(np.hypot(h, w))
    # 1. compact edge coordinates (static size; padding votes weight 0)
    flat = (edges.reshape(-1) != 0).astype(jnp.float32)
    score = flat - jnp.arange(h * w, dtype=jnp.float32) * 1e-9  # stable raster order
    top, idx = jax.lax.top_k(score, min(max_points, h * w))
    weight = (top > 0.5).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    thetas = np.arange(n_thetas, dtype=np.float64) * (np.pi / n_thetas)
    cos_t = jnp.asarray(np.cos(thetas).astype(np.float32))
    sin_t = jnp.asarray(np.sin(thetas).astype(np.float32))

    # 2. rho bins per theta: [T, N]
    rho = cos_t[:, None] * xs[None, :] + sin_t[:, None] * ys[None, :]
    binf = (rho + diag) * (rho_bins - 1) / (2.0 * diag)
    b = jnp.clip(jnp.round(binf), 0, rho_bins - 1).astype(jnp.int32)
    hi = b >> 6  # rho_bins must be <= 4096 (64*64)
    lo = b & 63
    lanes = jnp.arange(64, dtype=jnp.int32)
    oh_hi = (hi[..., None] == lanes).astype(jnp.float32) * weight[None, :, None]
    oh_lo = (lo[..., None] == lanes).astype(jnp.float32)
    acc = jnp.einsum(
        "tnh,tnl->thl", oh_hi, oh_lo, precision=jax.lax.Precision.HIGHEST
    ).reshape(n_thetas, 64 * 64)[:, :rho_bins].astype(jnp.int32)

    # 3. peaks: threshold + 3×3 NMS on (theta, rho)
    votes = acc
    best = votes
    for dt in (-1, 0, 1):
        for dr in (-1, 0, 1):
            if dt == 0 and dr == 0:
                continue
            best = jnp.maximum(best, jnp.roll(jnp.roll(votes, dt, 0), dr, 1))
    peak = (votes >= best) & (votes >= threshold)
    flat_v = jnp.where(peak, votes, 0).reshape(-1)
    topv, pidx = jax.lax.top_k(flat_v, max_lines)
    t_idx = pidx // rho_bins
    r_idx = pidx % rho_bins
    rho_val = r_idx.astype(jnp.float32) * (2.0 * diag) / (rho_bins - 1) - diag
    theta_val = t_idx.astype(jnp.float32) * float(np.pi / n_thetas)
    return (
        jnp.stack([rho_val, theta_val], axis=-1),
        topv > 0,
        topv,
    )


# ---------------------------------------------------------------------------
# NumPy oracle (classical accumulator, same quantization)
# ---------------------------------------------------------------------------


def hough_lines_numpy(
    edges: np.ndarray,
    n_thetas: int = 180,
    rho_bins: int = 2048,
    threshold: int = 50,
    max_lines: int = 32,
) -> Tuple[np.ndarray, np.ndarray]:
    h, w = edges.shape
    diag = float(np.hypot(h, w))
    ys, xs = np.nonzero(edges)
    thetas = np.arange(n_thetas, dtype=np.float64) * (np.pi / n_thetas)
    cos_t = np.cos(thetas).astype(np.float32)
    sin_t = np.sin(thetas).astype(np.float32)
    acc = np.zeros((n_thetas, rho_bins), np.int64)
    xf = xs.astype(np.float32)
    yf = ys.astype(np.float32)
    for t in range(n_thetas):
        rho = cos_t[t] * xf + sin_t[t] * yf
        # mirror the device's f32 op order exactly: (+) then (×) then (÷)
        binf = (
            (rho + np.float32(diag)) * np.float32(rho_bins - 1)
        ) / np.float32(2.0 * diag)
        b = np.clip(np.round(binf), 0, rho_bins - 1).astype(np.int64)
        np.add.at(acc[t], b, 1)
    best = acc.copy()
    for dt in (-1, 0, 1):
        for dr in (-1, 0, 1):
            if dt == 0 and dr == 0:
                continue
            best = np.maximum(best, np.roll(np.roll(acc, dt, 0), dr, 1))
    peak = (acc >= best) & (acc >= threshold)
    flat = np.where(peak, acc, 0).reshape(-1)
    order = np.argsort(-flat, kind="stable")[:max_lines]
    keep = flat[order] > 0
    order = order[keep]
    t_idx = order // rho_bins
    r_idx = order % rho_bins
    rho_val = r_idx * (2.0 * diag) / (rho_bins - 1) - diag
    theta_val = t_idx * (np.pi / n_thetas)
    return np.stack([rho_val, theta_val], axis=-1), flat[order]

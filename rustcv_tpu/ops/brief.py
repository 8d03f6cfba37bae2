"""BRIEF-256 descriptors + Hamming matching — the describe/match half of
the feature pipeline (FAST/Harris detect → BRIEF describe → match).

TPU formulation:
- one 5×5 Gaussian over the whole image (the frozen blur spec), then each
  keypoint's 33×33 patch comes from ONE dynamic_slice (the LK trick) and
  256 fixed point-pair compares pack into 8 u32 words — all vmapped over
  keypoints;
- matching is a MATMUL: descriptors as ±1 float32 [N, 256] × [256, M] on
  the MXU gives dot = 256 − 2·hamming, so nearest-by-hamming =
  argmax-by-dot; Lowe ratio test on the top-2.

Frozen spec: upright BRIEF (no orientation steering — fine for tracking /
stereo baselines), pair pattern drawn once from a fixed RNG seed
(gaussian-ish, clipped to the patch), compare strictly-greater on the
blurred image. Device == oracle bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .filters import gaussian5_u8

PATCH = 33  # sampling patch (half = 16)
NBITS = 256


@lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """[256, 4] int32 (y1, x1, y2, x2) offsets in [-16, 16], frozen
    (seeded normal pattern, the classic BRIEF G-II choice)."""
    rng = np.random.default_rng(20240131)
    pts = np.clip(
        np.round(rng.normal(0.0, PATCH / 5.0, size=(NBITS, 4))), -16, 16
    ).astype(np.int32)
    return pts


@partial(jax.jit, static_argnames=())
def brief_descriptors(gray: jax.Array, pts: jax.Array):
    """u8 gray (H, W) × [K, 2] float32 (x, y) keypoints → (desc u32 [K, 8],
    valid bool [K]). Keypoints whose 33×33 patch leaves the image are
    invalid (descriptor zeroed)."""
    h, w = gray.shape
    half = PATCH // 2
    blurred = gaussian5_u8(gray, has_channels=False).astype(jnp.int32)
    pat = jnp.asarray(brief_pattern())
    o1 = (pat[:, 0] + half) * PATCH + (pat[:, 1] + half)
    o2 = (pat[:, 2] + half) * PATCH + (pat[:, 3] + half)
    word = jnp.arange(NBITS, dtype=jnp.int32) // 32
    bit = jnp.arange(NBITS, dtype=jnp.int32) % 32

    def one(pt):
        x = jnp.round(pt[0]).astype(jnp.int32)
        y = jnp.round(pt[1]).astype(jnp.int32)
        ok = (x >= half) & (x <= w - 1 - half) & (y >= half) & (y <= h - 1 - half)
        patch = jax.lax.dynamic_slice(
            blurred,
            (jnp.clip(y - half, 0, h - PATCH), jnp.clip(x - half, 0, w - PATCH)),
            (PATCH, PATCH),
        ).reshape(-1)
        bits = (jnp.take(patch, o1) > jnp.take(patch, o2)).astype(jnp.uint32)
        desc = jnp.zeros(8, jnp.uint32)
        desc = desc.at[word].add(bits << bit.astype(jnp.uint32))
        return jnp.where(ok, desc, 0), ok

    return jax.vmap(one)(pts)


def match_descriptors(
    d1, d2, valid1=None, valid2=None, ratio: float = 0.8
) -> np.ndarray:
    """Hamming matching with Lowe ratio test → int32 [M, 2] (i1, i2).

    dist = 256 − popcount(XNOR) computed as a ±1 MXU matmul (dot =
    256 − 2·hamming); a match survives when best < ratio·second-best and
    it wins the mutual cross-check."""
    b1 = _bits_pm1(np.asarray(d1))
    b2 = _bits_pm1(np.asarray(d2))
    dot = jnp.asarray(b1) @ jnp.asarray(b2).T  # [N, M] f32, exact (≤256)
    ham = np.array((NBITS - dot) / 2.0)  # writable host copy
    if valid1 is not None:
        ham[~np.asarray(valid1)] = NBITS + 1
    if valid2 is not None:
        ham[:, ~np.asarray(valid2)] = NBITS + 1
    if ham.size == 0:
        return np.zeros((0, 2), np.int32)
    best2 = np.partition(ham, 1, axis=1)[:, :2] if ham.shape[1] > 1 else None
    j = np.argmin(ham, axis=1)
    i = np.arange(ham.shape[0])
    d_best = ham[i, j]
    keep = d_best <= NBITS
    if best2 is not None:
        # Strict inequality: an exact tie (ambiguous top-2) must reject —
        # at best == second == 0 any epsilon slack would wrongly keep it.
        keep &= d_best < ratio * best2[:, 1]
    # mutual cross-check
    back = np.argmin(ham, axis=0)
    keep &= back[j] == i
    return np.stack([i[keep], j[keep]], axis=-1).astype(np.int32)


def _bits_pm1(desc: np.ndarray) -> np.ndarray:
    """u32 [K, 8] → ±1 float32 [K, 256] (one vectorized shift)."""
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((desc[:, :, None] >> shifts) & 1).reshape(desc.shape[0], NBITS)
    return bits.astype(np.float32) * 2.0 - 1.0


# ---------------------------------------------------------------------------
# NumPy oracle
# ---------------------------------------------------------------------------


def brief_descriptors_numpy(
    gray: np.ndarray, pts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    from . import golden

    h, w = gray.shape
    half = PATCH // 2
    blurred = golden.gaussian5_u8(gray).astype(np.int64)
    pat = brief_pattern()
    descs = np.zeros((len(pts), 8), np.uint32)
    valid = np.zeros(len(pts), bool)
    for k, (px, py) in enumerate(np.asarray(pts, np.float64)):
        x = int(np.round(px))
        y = int(np.round(py))
        if not (half <= x <= w - 1 - half and half <= y <= h - 1 - half):
            continue
        valid[k] = True
        patch = blurred[y - half : y + half + 1, x - half : x + half + 1]
        for b in range(NBITS):
            y1, x1, y2, x2 = pat[b]
            if patch[y1 + half, x1 + half] > patch[y2 + half, x2 + half]:
                descs[k, b // 32] |= np.uint32(1) << np.uint32(b % 32)
    return descs, valid

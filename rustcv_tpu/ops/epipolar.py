"""Two-view epipolar geometry (OpenCV ``findFundamentalMat`` /
``computeCorrespondEpilines`` / ``triangulatePoints`` roles).

The reference has no multi-view geometry; OpenCV-parity addition in the
findHomography family (ops/geometry.py). Host float64 point math by the
same TPU split as ops/calib.py: correspondence counts are tiny (tens to
thousands), far below device break-even — the per-pixel consumers
(stereo remap, disparity reprojection) are the device side.

Frozen specs (all float64, deterministic):
- 8-point fit: Hartley-normalized (centroid → 0, RMS → √2) linear
  system, rank-2 enforcement by zeroing the smallest singular value,
  denormalized as T2ᵀ F T1, scaled so ‖F‖_F = 1 with a sign convention
  (largest-|entry| positive);
- RANSAC: seeded `default_rng`, 8-point minimal samples, Sampson
  distance gating, best-consensus refit on inliers (the exact protocol
  of geometry.find_homography);
- Sampson distance: (x₂ᵀFx₁)² / ((Fx₁)₀² + (Fx₁)₁² + (Fᵀx₂)₀² +
  (Fᵀx₂)₁²), thresholded at ``thresh²``;
- triangulation: per-point 4×4 DLT (two rows per view from P), smallest
  right singular vector, returned as (N, 4) homogeneous (callers divide
  by w — OpenCV's ``triangulatePoints`` convention transposed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _normalize(pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Hartley normalization → (T 3×3, normalized (N, 2))."""
    c = pts.mean(axis=0)
    d = np.sqrt(((pts - c) ** 2).sum(axis=1)).mean()
    s = np.sqrt(2.0) / max(d, 1e-12)
    t = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
    return t, (pts - c) * s


def fit_fundamental_8point(src: np.ndarray,
                           dst: np.ndarray) -> Optional[np.ndarray]:
    """Normalized 8-point fit → F 3×3 with ``dstᵀ F src = 0`` (needs
    ≥ 8 correspondences; rank-2 enforced)."""
    src = np.asarray(src, np.float64).reshape(-1, 2)
    dst = np.asarray(dst, np.float64).reshape(-1, 2)
    if len(src) < 8 or len(src) != len(dst):
        return None
    t1, p1 = _normalize(src)
    t2, p2 = _normalize(dst)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    a = np.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                  np.ones_like(x1)], axis=1)
    try:
        _, _, vt = np.linalg.svd(a)
    except np.linalg.LinAlgError:
        return None
    f = vt[-1].reshape(3, 3)
    u, s, vtf = np.linalg.svd(f)
    f = u @ np.diag([s[0], s[1], 0.0]) @ vtf
    f = t2.T @ f @ t1
    n = np.linalg.norm(f)
    if n < 1e-12:
        return None
    f = f / n
    ij = np.unravel_index(np.argmax(np.abs(f)), f.shape)
    return f if f[ij] >= 0 else -f


def sampson_distance(f: np.ndarray, src: np.ndarray,
                     dst: np.ndarray) -> np.ndarray:
    """First-order geometric (Sampson) distance per correspondence."""
    src = np.asarray(src, np.float64).reshape(-1, 2)
    dst = np.asarray(dst, np.float64).reshape(-1, 2)
    h1 = np.concatenate([src, np.ones((len(src), 1))], axis=1)
    h2 = np.concatenate([dst, np.ones((len(dst), 1))], axis=1)
    fx1 = h1 @ f.T        # F x1  (N, 3)
    ftx2 = h2 @ f         # Fᵀ x2 (N, 3)
    num = np.sum(h2 * fx1, axis=1) ** 2
    den = fx1[:, 0] ** 2 + fx1[:, 1] ** 2 + ftx2[:, 0] ** 2 + ftx2[:, 1] ** 2
    return num / np.maximum(den, 1e-12)


def find_fundamental_mat(
    src_pts,
    dst_pts,
    ransac_thresh: float = 3.0,
    iters: int = 200,
    seed: int = 7,
    method: str = "ransac",
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Fundamental matrix (OpenCV ``findFundamentalMat`` role) →
    (F float64 3×3 or None, inlier mask). ``method`` = "ransac" |
    "8point" (all points, mask all-True). Deterministic per seed."""
    src = np.asarray(src_pts, np.float64).reshape(-1, 2)
    dst = np.asarray(dst_pts, np.float64).reshape(-1, 2)
    n = len(src)
    if n != len(dst) or n < 8:
        return None, np.zeros(n, bool)
    if method == "8point":
        f = fit_fundamental_8point(src, dst)
        return f, np.ones(n, bool) if f is not None else np.zeros(n, bool)
    if method != "ransac":
        raise ValueError(f"unknown method {method!r}")
    rng = np.random.default_rng(seed)
    t2 = ransac_thresh * ransac_thresh
    best_mask = np.zeros(n, bool)
    best_f = None
    for _ in range(iters):
        idx = rng.choice(n, size=8, replace=False)
        f = fit_fundamental_8point(src[idx], dst[idx])
        if f is None:
            continue
        mask = sampson_distance(f, src, dst) < t2
        if mask.sum() > best_mask.sum():
            best_mask = mask
            best_f = f
    if best_f is None or best_mask.sum() < 8:
        return None, np.zeros(n, bool)
    refined = fit_fundamental_8point(src[best_mask], dst[best_mask])
    if refined is not None:
        best_mask = sampson_distance(refined, src, dst) < t2
        best_f = refined
    return best_f, best_mask


def compute_correspond_epilines(points, which_image: int,
                                f: np.ndarray) -> np.ndarray:
    """Epipolar lines in the OTHER image for ``points`` from image
    ``which_image`` ∈ {1, 2} → (N, 3) lines (a, b, c), a²+b² = 1
    (OpenCV ``computeCorrespondEpilines`` role)."""
    pts = np.asarray(points, np.float64).reshape(-1, 2)
    h = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    if which_image == 1:
        lines = h @ np.asarray(f, np.float64).T   # l2 = F x1
    elif which_image == 2:
        lines = h @ np.asarray(f, np.float64)     # l1 = Fᵀ x2
    else:
        raise ValueError("which_image must be 1 or 2")
    nrm = np.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)
    return lines / np.maximum(nrm, 1e-12)[:, None]


def triangulate_points(p1: np.ndarray, p2: np.ndarray, pts1,
                       pts2) -> np.ndarray:
    """DLT triangulation (OpenCV ``triangulatePoints`` role):
    3×4 projections P1/P2 + (N, 2) pixel points → (N, 4) homogeneous."""
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    a1 = np.asarray(pts1, np.float64).reshape(-1, 2)
    a2 = np.asarray(pts2, np.float64).reshape(-1, 2)
    if len(a1) != len(a2):
        raise ValueError("point lists must match")
    out = np.empty((len(a1), 4))
    for i in range(len(a1)):
        a = np.stack([
            a1[i, 0] * p1[2] - p1[0],
            a1[i, 1] * p1[2] - p1[1],
            a2[i, 0] * p2[2] - p2[0],
            a2[i, 1] * p2[2] - p2[1],
        ])
        _, _, vt = np.linalg.svd(a)
        out[i] = vt[-1]
    return out

"""ECC image alignment (OpenCV ``findTransformECC`` /
``computeECC`` roles — Evangelidis & Psarakis, PAMI 2008).

The reference has no dense alignment; OpenCV-parity addition
complementing the sparse estimators (ops/registration.py) and
phaseCorrelate. Whole-image work → a device twin exists alongside the
frozen host oracle: each iteration is bilinear sampling at warp-derived
coordinates (the remap packed-quad shape), elementwise Jacobians, and
one tiny (n×n, n ≤ 8) solve — all inside a single ``fori_loop``
program, warp parameters traced (new initial guesses never recompile).

Frozen spec (float64 oracle; forward-additive ECC):
- warp W(x; p) maps TEMPLATE coords → INPUT coords (OpenCV's
  convention): "translation" (2 dof), "euclidean" (3), "affine" (6),
  "homography" (8, matrix normalized to m22 = 1);
- sampling: bilinear with clamp-to-edge coordinates (every template
  pixel participates — no validity mask);
- per iteration: iw = I(W(x)), gradients of I sampled the same way
  (central differences on I first, then warped), steepest-descent
  images G = [∇I_w]·∂W/∂p, zero-mean t̄ and ī over the full template,
  projection P = G(GᵀG)⁻¹Gᵀ, λ = (‖ī‖² − īᵀPī)/(t̄ᵀī − t̄ᵀPī),
  Δp = (GᵀG)⁻¹Gᵀ(λt̄ − ī), p += Δp;
- a non-positive λ denominator means the images are uncorrelated in
  the current basin: the oracle raises ValueError (OpenCV errors the
  same way), the device twin freezes further updates and reports
  rho = −1;
- stop after ``iterations`` or when |ρ − ρ_prev| < ``eps``
  (ρ = t̄ᵀī/(‖t̄‖·‖ī‖)); returns (rho, warp) with warp 2×3 (3×3 for
  homography).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["find_transform_ecc", "find_transform_ecc_numpy",
           "compute_ecc"]

_MOTIONS = ("translation", "euclidean", "affine", "homography")


def _warp_init(motion: str, warp) -> np.ndarray:
    if motion not in _MOTIONS:
        raise ValueError(f"unknown motion type {motion!r}")
    if warp is None:
        return np.eye(3, dtype=np.float64) if motion == "homography" \
            else np.eye(2, 3, dtype=np.float64)
    w = np.asarray(warp, np.float64)
    if motion == "homography":
        if w.shape == (2, 3):
            w = np.vstack([w, [0.0, 0.0, 1.0]])
        if w.shape != (3, 3):
            raise ValueError("homography warp must be 3x3")
        return w / w[2, 2]
    if w.shape == (3, 3):
        w = w[:2]
    if w.shape != (2, 3):
        raise ValueError("warp must be 2x3")
    return w.copy()


def _params_of(motion: str, w: np.ndarray) -> np.ndarray:
    if motion == "translation":
        return np.array([w[0, 2], w[1, 2]])
    if motion == "euclidean":
        return np.array([np.arctan2(w[1, 0], w[0, 0]), w[0, 2], w[1, 2]])
    if motion == "affine":
        return w[:2].reshape(-1)
    return np.array([w[0, 0], w[0, 1], w[0, 2], w[1, 0], w[1, 1],
                     w[1, 2], w[2, 0], w[2, 1]])


def _warp_of(motion: str, p: np.ndarray) -> np.ndarray:
    if motion == "translation":
        return np.array([[1.0, 0, p[0]], [0, 1.0, p[1]]])
    if motion == "euclidean":
        c, s = np.cos(p[0]), np.sin(p[0])
        return np.array([[c, -s, p[1]], [s, c, p[2]]])
    if motion == "affine":
        return p.reshape(2, 3)
    return np.array([[p[0], p[1], p[2]], [p[3], p[4], p[5]],
                     [p[6], p[7], 1.0]])


def _sample_np(img: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    h, w = img.shape
    x = np.clip(xs, 0.0, w - 1.0)
    y = np.clip(ys, 0.0, h - 1.0)
    x0 = np.minimum(np.floor(x).astype(np.int64), w - 2)
    y0 = np.minimum(np.floor(y).astype(np.int64), h - 2)
    fx = x - x0
    fy = y - y0
    a = img[y0, x0]
    b = img[y0, x0 + 1]
    c = img[y0 + 1, x0]
    d = img[y0 + 1, x0 + 1]
    return a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) + \
        c * (1 - fx) * fy + d * fx * fy


def _coords(motion: str, p: np.ndarray, h: int, w: int):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    m = _warp_of(motion, p)
    if motion == "homography":
        d = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
        return ((m[0, 0] * xs + m[0, 1] * ys + m[0, 2]) / d,
                (m[1, 0] * xs + m[1, 1] * ys + m[1, 2]) / d, d)
    return (m[0, 0] * xs + m[0, 1] * ys + m[0, 2],
            m[1, 0] * xs + m[1, 1] * ys + m[1, 2], None)


def _jacobian_np(motion: str, gx, gy, xs, ys, p, denom):
    """Steepest-descent images (N, n_params)."""
    if motion == "translation":
        cols = [gx, gy]
    elif motion == "euclidean":
        c, s = np.cos(p[0]), np.sin(p[0])
        dxdth = -s * xs - c * ys
        dydth = c * xs - s * ys
        cols = [gx * dxdth + gy * dydth, gx, gy]
    elif motion == "affine":
        cols = [gx * xs, gx * ys, gx, gy * xs, gy * ys, gy]
    else:  # homography (denominators from the current warp)
        wx, wy, d = denom
        inv = 1.0 / d
        cols = [gx * xs * inv, gx * ys * inv, gx * inv,
                gy * xs * inv, gy * ys * inv, gy * inv,
                (-gx * wx - gy * wy) * xs * inv,
                (-gx * wx - gy * wy) * ys * inv]
    return np.stack([c.reshape(-1) for c in cols], axis=1)


def find_transform_ecc_numpy(
    template,
    image,
    motion: str = "affine",
    warp=None,
    iterations: int = 50,
    eps: float = 1e-6,
) -> Tuple[float, np.ndarray]:
    """Frozen ECC spec → (rho, warp 2×3 or 3×3 float64)."""
    t = np.asarray(template, np.float64)
    im = np.asarray(image, np.float64)
    if t.ndim != 2 or im.ndim != 2:
        raise ValueError("ECC expects gray images")
    h, w = t.shape
    p = _params_of(motion, _warp_init(motion, warp))
    gy_full, gx_full = np.gradient(im)
    tz = t - t.mean()
    tnorm = np.linalg.norm(tz)
    tzf = tz.reshape(-1)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    rho_prev = -np.inf
    rho = -1.0
    for _ in range(iterations):
        wx, wy, d = _coords(motion, p, h, w)
        iw = _sample_np(im, wx, wy)
        gx = _sample_np(gx_full, wx, wy)
        gy = _sample_np(gy_full, wx, wy)
        iz = (iw - iw.mean()).reshape(-1)
        inorm = np.linalg.norm(iz)
        rho = float(tzf @ iz / max(tnorm * inorm, 1e-300))
        if abs(rho - rho_prev) < eps:
            break
        rho_prev = rho
        g = _jacobian_np(motion, gx, gy, xs, ys, p, (wx, wy, d))
        g = g - g.mean(axis=0)          # zero-mean like t̄, ī
        gtg = g.T @ g
        try:
            gtg_inv = np.linalg.inv(gtg)
        except np.linalg.LinAlgError:
            raise ValueError("ECC: singular Jacobian (flat image?)")
        gti = g.T @ iz
        gtt = g.T @ tzf
        num = inorm * inorm - gti @ gtg_inv @ gti
        den = tzf @ iz - gtt @ gtg_inv @ gti
        if den <= 0:
            raise ValueError(
                "ECC: non-positive correlation denominator — the images "
                "may be uncorrelated or the initial warp too far off")
        lam = num / den
        err = lam * tzf - iz
        dp = gtg_inv @ (g.T @ err)
        p = p + dp
    return rho, _warp_of(motion, p)


def compute_ecc(template, image) -> float:
    """Enhanced correlation coefficient of two equal-size gray images
    (OpenCV ``computeECC`` role): zero-mean normalized correlation."""
    t = np.asarray(template, np.float64)
    im = np.asarray(image, np.float64)
    tz = (t - t.mean()).reshape(-1)
    iz = (im - im.mean()).reshape(-1)
    return float(tz @ iz / max(np.linalg.norm(tz) * np.linalg.norm(iz),
                               1e-300))


# ---------------------------------------------------------------------------
# device twin (float32, fixed iteration count, traced warp)
# ---------------------------------------------------------------------------

def _sample_j(img, xs, ys):
    h, w = img.shape
    x = jnp.clip(xs, 0.0, w - 1.0)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), w - 2)
    y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), h - 2)
    fx = x - x0
    fy = y - y0
    a = img[y0, x0]
    b = img[y0, x0 + 1]
    c = img[y0 + 1, x0]
    d = img[y0 + 1, x0 + 1]
    return a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) + \
        c * (1 - fx) * fy + d * fx * fy


@partial(jax.jit, static_argnames=("motion", "iterations"))
def _ecc_core(t, im, p0, motion: str, iterations: int, eps: float):
    h, w = t.shape
    t = t.astype(jnp.float32)
    im = im.astype(jnp.float32)
    gy_full, gx_full = jnp.gradient(im)
    tz = t - t.mean()
    tnorm = jnp.linalg.norm(tz)
    tzf = tz.reshape(-1)
    ys, xs = jnp.mgrid[0:h, 0:w]
    ys = ys.astype(jnp.float32)
    xs = xs.astype(jnp.float32)

    def warp_coords(p):
        if motion == "translation":
            return xs + p[0], ys + p[1], None
        if motion == "euclidean":
            c, s = jnp.cos(p[0]), jnp.sin(p[0])
            return c * xs - s * ys + p[1], s * xs + c * ys + p[2], None
        if motion == "affine":
            return (p[0] * xs + p[1] * ys + p[2],
                    p[3] * xs + p[4] * ys + p[5], None)
        d = p[6] * xs + p[7] * ys + 1.0
        return ((p[0] * xs + p[1] * ys + p[2]) / d,
                (p[3] * xs + p[4] * ys + p[5]) / d, d)

    def jac(p, gx, gy, denom):
        if motion == "translation":
            cols = [gx, gy]
        elif motion == "euclidean":
            c, s = jnp.cos(p[0]), jnp.sin(p[0])
            cols = [gx * (-s * xs - c * ys) + gy * (c * xs - s * ys),
                    gx, gy]
        elif motion == "affine":
            cols = [gx * xs, gx * ys, gx, gy * xs, gy * ys, gy]
        else:
            wx, wy, d = denom
            inv = 1.0 / d
            cols = [gx * xs * inv, gx * ys * inv, gx * inv,
                    gy * xs * inv, gy * ys * inv, gy * inv,
                    (-gx * wx - gy * wy) * xs * inv,
                    (-gx * wx - gy * wy) * ys * inv]
        return jnp.stack([c.reshape(-1) for c in cols], axis=1)

    nparam = p0.shape[0]

    def body(_, state):
        p, rho_prev, frozen = state
        wx, wy, d = warp_coords(p)
        iw = _sample_j(im, wx, wy)
        gx = _sample_j(gx_full, wx, wy)
        gy = _sample_j(gy_full, wx, wy)
        iz = (iw - iw.mean()).reshape(-1)
        inorm = jnp.linalg.norm(iz)
        rho = tzf @ iz / jnp.maximum(tnorm * inorm, 1e-30)
        g = jac(p, gx, gy, (wx, wy, d))
        g = g - g.mean(axis=0)
        gtg = g.T @ g + 1e-12 * jnp.eye(nparam, dtype=jnp.float32)
        gti = g.T @ iz
        gtt = g.T @ tzf
        sol_i = jnp.linalg.solve(gtg, gti)
        num = inorm * inorm - gti @ sol_i
        den = tzf @ iz - gtt @ sol_i
        bad = den <= 0
        lam = num / jnp.where(bad, 1.0, den)
        err = lam * tzf - iz
        dp = jnp.linalg.solve(gtg, g.T @ err)
        conv = jnp.abs(rho - rho_prev) < eps
        stop = frozen | bad | conv
        p_new = jnp.where(stop, p, p + dp)
        rho_out = jnp.where(bad, -1.0, rho)
        return p_new, rho_out, stop | frozen

    p, rho, _ = jax.lax.fori_loop(
        0, iterations, body,
        (p0.astype(jnp.float32), jnp.float32(-2.0), jnp.bool_(False)))
    return rho, p


def find_transform_ecc(
    template,
    image,
    motion: str = "affine",
    warp=None,
    iterations: int = 50,
    eps: float = 1e-6,
    backend: str = "host",
):
    """ECC alignment (OpenCV ``findTransformECC`` role) → (rho, warp).
    ``backend`` = "host" (f64 oracle, default — raises on uncorrelated
    images like OpenCV) | "device" (f32 fori_loop twin — freezes and
    reports rho = −1 instead of raising; agreement with the oracle is
    tested to ~1e-2 px of warp translation on synthetic scenes)."""
    if backend == "host":
        return find_transform_ecc_numpy(template, image, motion, warp,
                                        iterations, eps)
    if backend != "device":
        raise ValueError(backend)
    p0 = _params_of(motion, _warp_init(motion, warp))
    rho, p = _ecc_core(jnp.asarray(template), jnp.asarray(image),
                       jnp.asarray(p0, jnp.float32), motion,
                       int(iterations), float(eps))
    return float(rho), _warp_of(motion, np.asarray(p, np.float64))


def find_transform_ecc_multiscale(template, image, motion: str = "affine",
                                  levels: int = 3, iterations: int = 30,
                                  eps: float = 1e-6
                                  ) -> Tuple[float, np.ndarray]:
    """Coarse-to-fine ECC (OpenCV ``findTransformECCMultiScale`` role):
    solve on a pyramid, upscaling the warp's translation part between
    levels — converges for displacements far beyond the single-scale
    basin. → (rho, warp)."""
    from .golden import pyr_down

    t = np.asarray(template)
    im = np.asarray(image)
    pyr_t = [t]
    pyr_i = [im]
    for _ in range(levels - 1):
        pyr_t.append(pyr_down(pyr_t[-1]))
        pyr_i.append(pyr_down(pyr_i[-1]))
    warp = None
    rho = 0.0
    for lvl in range(levels - 1, -1, -1):
        if warp is not None:
            warp = warp.copy()
            if warp.shape == (3, 3):
                warp[0, 2] *= 2.0
                warp[1, 2] *= 2.0
                warp[2, 0] /= 2.0
                warp[2, 1] /= 2.0
            else:
                warp[:, 2] *= 2.0
        rho, warp = find_transform_ecc_numpy(
            pyr_t[lvl], pyr_i[lvl], motion=motion, warp=warp,
            iterations=iterations, eps=eps)
    return rho, warp

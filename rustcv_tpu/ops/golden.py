"""Golden CPU oracles — the frozen, bit-exact specification of every kernel.

Each device kernel in :mod:`rustcv_tpu.ops` is validated bit-for-bit against
these NumPy implementations. Where the Rust reference defines the arithmetic
we port its integer formulas exactly; where it doesn't (resize, blur, Sobel,
Harris — demanded by BASELINE configs but absent from the reference), we
freeze our own integer-first spec here, per SURVEY.md §7 "define oracle = our
NumPy spec, then freeze it".

Reference arithmetic ported exactly:
- YUYV→BGR BT.601 integer: ``rustcv-camera/src/decode.rs:160-191`` and
  ``rustcv/src/videoio/mod.rs:344-371`` —
  ``B=(298c+516d+128)>>8, G=(298c-100d-208e+128)>>8, R=(298c+409e+128)>>8``
  with c=Y-16, d=U-128, e=V-128, clamp to [0,255]; arithmetic (sign-
  preserving) right shift, exactly as Rust ``i32 >>``.
- BGRA→BGR drop alpha: ``decode.rs:200-207``; RGB→BGR swap: ``decode.rs:213-219``.
- rectangle: ``rustcv/src/imgproc/drawing.rs:67-106`` including its exact
  clipping/overdraw/flat-index bound-check semantics.
- text alpha blend: ``drawing.rs:123-163`` (we freeze an integer variant of
  its float blend; see :func:`blend_mask`).

Frozen specs defined here (integer-exact, platform-independent):
- NV12→BGR: same BT.601 constants, 2×2 nearest chroma upsampling.
- bgr→gray: ``(77R + 150G + 29B + 128) >> 8`` (integer BT.601 luma).
- bilinear resize: half-pixel centers, 11-bit fixed-point separable lerp.
- Gaussian 5×5: separable [1,4,6,4,1] (sum 16 per axis), replicate border,
  single final rounding ``(Σ + 128) >> 8``.
- Sobel 3×3 + gradient magnitude ``min(255, isqrt(gx²+gy²))``.
- Harris: fixed-point int32 (``harris_response_i32`` — bit-exact corner
  spec; the float ``harris_response`` remains as a response-surface API).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Color conversions (integer BT.601)
# ---------------------------------------------------------------------------


def _bt601_to_bgr(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Shared BT.601 integer kernel. y/u/v int32 arrays of identical shape."""
    c = y - 16
    d = u - 128
    e = v - 128
    b = (298 * c + 516 * d + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    r = (298 * c + 409 * e + 128) >> 8
    out = np.stack([b, g, r], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def yuyv_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """YUYV (packed 4:2:2) → BGR, exact port of decode.rs:160-191.

    ``src``: flat u8 of length ≥ width*height*2; returns (H, W, 3) u8.
    """
    m = src.reshape(-1)[: width * height * 2].astype(np.int32).reshape(height, width // 2, 4)
    y0, u, y1, v = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
    y = np.stack([y0, y1], axis=-1)  # (H, W/2, 2)
    u2 = np.broadcast_to(u[..., None], y.shape)
    v2 = np.broadcast_to(v[..., None], y.shape)
    return _bt601_to_bgr(y, u2, v2).reshape(height, width, 3)


def uyvy_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """UYVY (packed 4:2:2, chroma first) → BGR; same BT.601 math as YUYV."""
    m = src.reshape(-1)[: width * height * 2].astype(np.int32).reshape(height, width // 2, 4)
    u, y0, v, y1 = m[..., 0], m[..., 1], m[..., 2], m[..., 3]
    y = np.stack([y0, y1], axis=-1)
    u2 = np.broadcast_to(u[..., None], y.shape)
    v2 = np.broadcast_to(v[..., None], y.shape)
    return _bt601_to_bgr(y, u2, v2).reshape(height, width, 3)


def nv12_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """NV12 (planar Y + interleaved half-res UV) → BGR.

    Frozen spec: nearest (2×2 block) chroma upsampling, BT.601 integer.
    """
    flat = src.reshape(-1)
    y = flat[: width * height].astype(np.int32).reshape(height, width)
    uv = flat[width * height : width * height * 3 // 2].astype(np.int32)
    uv = uv.reshape(height // 2, width // 2, 2)
    u = np.repeat(np.repeat(uv[..., 0], 2, axis=0), 2, axis=1)
    v = np.repeat(np.repeat(uv[..., 1], 2, axis=0), 2, axis=1)
    return _bt601_to_bgr(y, u, v)


def yv12_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """YV12 (planar Y, then V, then U — note the V-first order,
    rustcv-backend-msmf/src/stream.rs:334-365) → BGR.

    Frozen spec: nearest 2×2 chroma upsampling, BT.601 integer (as NV12).
    """
    flat = src.reshape(-1)
    npix = width * height
    nquarter = npix // 4
    y = flat[:npix].astype(np.int32).reshape(height, width)
    v = flat[npix : npix + nquarter].astype(np.int32).reshape(height // 2, width // 2)
    u = flat[npix + nquarter : npix + 2 * nquarter].astype(np.int32).reshape(
        height // 2, width // 2
    )
    u = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)
    v = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)
    return _bt601_to_bgr(y, u, v)


def bgra_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """BGRA32 → BGR24, drop alpha (decode.rs:200-207)."""
    m = src.reshape(-1)[: width * height * 4].reshape(height, width, 4)
    return np.ascontiguousarray(m[..., :3])


def rgba_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    m = src.reshape(-1)[: width * height * 4].reshape(height, width, 4)
    return np.ascontiguousarray(m[..., [2, 1, 0]])


def rgb_to_bgr(src: np.ndarray, width: int, height: int) -> np.ndarray:
    """RGB24 → BGR24 channel swap (decode.rs:213-219)."""
    m = src.reshape(-1)[: width * height * 3].reshape(height, width, 3)
    return np.ascontiguousarray(m[..., ::-1])


def bgr_to_gray(bgr: np.ndarray) -> np.ndarray:
    """Frozen integer BT.601 luma: (77R + 150G + 29B + 128) >> 8."""
    b = bgr[..., 0].astype(np.int32)
    g = bgr[..., 1].astype(np.int32)
    r = bgr[..., 2].astype(np.int32)
    return ((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)


def bgr_to_hsv(bgr: np.ndarray) -> np.ndarray:
    """Frozen EXACT-integer HSV (OpenCV 8-bit convention: H ∈ [0, 180),
    S/V ∈ [0, 255]), all arithmetic integer so device == oracle
    bit-for-bit (no data-dependent float division in the spec):

    - V = max(B, G, R); diff = V − min(B, G, R)
    - S = 0 when V == 0 else round_half_up(255·diff / V)
      = (510·diff + V) // (2·V)
    - H: num = (G−B | B−R | R−G) by argmax channel (R wins ties, then G),
      base = 0 | 120 | 240; T = base·diff + 60·num (+360·diff when
      negative); H = round_half_up(T / (2·diff)) mod 180; H = 0 when
      diff == 0.
    """
    b = bgr[..., 0].astype(np.int64)
    g = bgr[..., 1].astype(np.int64)
    r = bgr[..., 2].astype(np.int64)
    v = np.maximum(np.maximum(b, g), r)
    mn = np.minimum(np.minimum(b, g), r)
    diff = v - mn
    s = np.where(v == 0, 0, (510 * diff + v) // np.maximum(2 * v, 1))
    num = np.where(
        r == v, g - b, np.where(g == v, b - r, r - g)
    )
    base = np.where(r == v, 0, np.where(g == v, 120, 240))
    t = base * diff + 60 * num
    t = np.where(t < 0, t + 360 * diff, t)
    h = np.where(diff == 0, 0, (t + diff) // np.maximum(2 * diff, 1) % 180)
    return np.stack([h, s, v], axis=-1).astype(np.uint8)


def bgr_to_ycrcb(bgr: np.ndarray) -> np.ndarray:
    """Frozen integer BGR → YCrCb (OpenCV 8-bit convention, 14-bit
    fixed-point constants: 0.299/0.587/0.114 luma, 0.713/0.564 chroma):

    - Y  = (4899·R + 9617·G + 1868·B + 8192) >> 14
    - Cr = ((R − Y)·11682 + (128<<14) + 8192) >> 14, clamped to [0, 255]
    - Cb = ((B − Y)·9241  + (128<<14) + 8192) >> 14, clamped

    All shifts arithmetic (floor) — device == oracle bit-for-bit.
    """
    b = bgr[..., 0].astype(np.int64)
    g = bgr[..., 1].astype(np.int64)
    r = bgr[..., 2].astype(np.int64)
    y = (4899 * r + 9617 * g + 1868 * b + 8192) >> 14
    cr = ((r - y) * 11682 + (128 << 14) + 8192) >> 14
    cb = ((b - y) * 9241 + (128 << 14) + 8192) >> 14
    out = np.stack([y, np.clip(cr, 0, 255), np.clip(cb, 0, 255)], axis=-1)
    return out.astype(np.uint8)


def ycrcb_to_bgr(ycrcb: np.ndarray) -> np.ndarray:
    """Frozen integer YCrCb → BGR (inverse constants 1.403/0.714/0.344/
    1.773 as 22987/11698/5638/29049 over 2^14; same descale discipline)."""
    y = ycrcb[..., 0].astype(np.int64)
    cr = ycrcb[..., 1].astype(np.int64) - 128
    cb = ycrcb[..., 2].astype(np.int64) - 128
    r = y + ((22987 * cr + 8192) >> 14)
    g = y + ((-11698 * cr - 5638 * cb + 8192) >> 14)
    b = y + ((29049 * cb + 8192) >> 14)
    out = np.stack([b, g, r], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def hsv_to_bgr(hsv: np.ndarray) -> np.ndarray:
    """Frozen integer HSV → BGR (inverse of :func:`bgr_to_hsv`'s 8-bit
    convention, H ∈ [0, 180)): sector = H // 30, rem = H % 30, and with
    round-half-up rational division ``rdiv(a, d) = (2a + d) // (2d)``:

    - p = rdiv(V·(255 − S), 255)
    - q = rdiv(V·(255·30 − S·rem), 255·30)
    - t = rdiv(V·(255·30 − S·(30 − rem)), 255·30)
    - (B, G, R) by sector: 0→(p,t,V) 1→(p,V,q) 2→(t,V,p) 3→(V,q,p)
      4→(V,p,t) 5→(q,p,V); S == 0 → (V, V, V).

    An exact inverse of the quantized forward map does not exist (H is
    quantized to 2°); round-tripping bgr→hsv→bgr is tested to ±4 LSB.
    """
    h = hsv[..., 0].astype(np.int64)
    s = hsv[..., 1].astype(np.int64)
    v = hsv[..., 2].astype(np.int64)
    sector = (h // 30) % 6
    rem = h % 30

    def rdiv(a, d):
        return (2 * a + d) // (2 * d)

    p = rdiv(v * (255 - s), 255)
    q = rdiv(v * (255 * 30 - s * rem), 255 * 30)
    t = rdiv(v * (255 * 30 - s * (30 - rem)), 255 * 30)
    tabs = np.array(
        [[1, 3, 0], [1, 0, 2], [3, 0, 1], [0, 2, 1], [0, 1, 3], [2, 1, 0]],
        np.int64,
    )  # indices into (v, p, q, t) per (sector, channel BGR)
    stackvpqt = np.stack([v, p, q, t], axis=-1)
    sel = tabs[sector]  # (..., 3)
    out = np.take_along_axis(stackvpqt, sel, axis=-1)
    out = np.where((s == 0)[..., None], v[..., None], out)
    return np.clip(out, 0, 255).astype(np.uint8)


_LAB_M = np.array(  # sRGB→XYZ (D65), rows applied to (R, G, B)
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    np.float64,
)
_LAB_WHITE = (0.950456, 1.0, 1.088754)  # Xn, Yn, Zn


def bgr_to_lab(bgr: np.ndarray) -> np.ndarray:
    """Frozen CIE L*a*b* spec, u8 in/out (OpenCV 8-bit convention:
    L·255/100, a+128, b+128), float64 oracle:

    sRGB gamma linearization (t>0.04045 → ((t+0.055)/1.055)^2.4 else
    t/12.92) → XYZ (D65) → f(t) = t^(1/3) for t > (6/29)³ else
    t/(3·(6/29)²) + 4/29 → L = 116·fy − 16, a = 500(fx−fy),
    b = 200(fy−fz); round-half-even quantization, clipped to u8.
    Device (float32) agrees within ±1 LSB (documented tolerance, like
    corner_sub_pix)."""
    srgb = bgr[..., ::-1].astype(np.float64) / 255.0
    lin = np.where(
        srgb > 0.04045, ((srgb + 0.055) / 1.055) ** 2.4, srgb / 12.92
    )
    xyz = lin @ _LAB_M.T
    d = 6.0 / 29.0
    t = xyz / np.array(_LAB_WHITE)
    f = np.where(t > d**3, np.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    ell = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    out = np.stack(
        [np.round(ell * 255.0 / 100.0), np.round(a) + 128.0, np.round(b) + 128.0],
        axis=-1,
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def lab_to_bgr(lab: np.ndarray) -> np.ndarray:
    """Inverse of :func:`bgr_to_lab` (same frozen conventions); round-trip
    error is bounded by the u8 quantization of a/b (±3 LSB tested)."""
    ell = lab[..., 0].astype(np.float64) * 100.0 / 255.0
    a = lab[..., 1].astype(np.float64) - 128.0
    b = lab[..., 2].astype(np.float64) - 128.0
    fy = (ell + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    d = 6.0 / 29.0

    def finv(f):
        return np.where(f > d, f**3, 3 * d * d * (f - 4.0 / 29.0))

    xyz = np.stack([finv(fx), finv(fy), finv(fz)], axis=-1) * np.array(_LAB_WHITE)
    lin = xyz @ np.linalg.inv(_LAB_M).T
    srgb = np.where(
        lin > 0.0031308, 1.055 * np.maximum(lin, 0.0) ** (1 / 2.4) - 0.055,
        12.92 * lin,
    )
    out = np.round(srgb[..., ::-1] * 255.0)
    return np.clip(out, 0, 255).astype(np.uint8)


def in_range(img: np.ndarray, lower, upper) -> np.ndarray:
    """Per-channel inclusive range mask → u8 {0, 255} (OpenCV inRange)."""
    lo = np.asarray(lower, np.int32)
    hi = np.asarray(upper, np.int32)
    a = img.astype(np.int32)
    ok = np.all((a >= lo) & (a <= hi), axis=-1)
    return np.where(ok, 255, 0).astype(np.uint8)


def hu_moments(mask: np.ndarray) -> np.ndarray:
    """The seven Hu invariant moments of a u8 mask/gray image (OpenCV
    ``HuMoments``): translation/scale/rotation invariants from normalized
    central moments (float64; raw sums exact int64)."""
    a = mask.astype(np.int64)
    if a.ndim == 3:
        a = a[..., 0]
    h, w = a.shape
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    m00 = a.sum()
    if m00 == 0:
        return np.zeros(7)
    xb = (a * xs).sum() / m00
    yb = (a * ys).sum() / m00
    xc = xs - xb
    yc = ys - yb

    def mu(p, q):
        return float((a * xc**p * yc**q).sum())

    n = float(m00)

    def eta(p, q):
        return mu(p, q) / n ** (1 + (p + q) / 2.0)

    n20, n02, n11 = eta(2, 0), eta(0, 2), eta(1, 1)
    n30, n03 = eta(3, 0), eta(0, 3)
    n21, n12 = eta(2, 1), eta(1, 2)
    h1 = n20 + n02
    h2 = (n20 - n02) ** 2 + 4 * n11**2
    h3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    h5 = (n30 - 3 * n12) * (n30 + n12) * (
        (n30 + n12) ** 2 - 3 * (n21 + n03) ** 2
    ) + (3 * n21 - n03) * (n21 + n03) * (
        3 * (n30 + n12) ** 2 - (n21 + n03) ** 2
    )
    h6 = (n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2) + 4 * n11 * (
        n30 + n12
    ) * (n21 + n03)
    h7 = (3 * n21 - n03) * (n30 + n12) * (
        (n30 + n12) ** 2 - 3 * (n21 + n03) ** 2
    ) - (n30 - 3 * n12) * (n21 + n03) * (
        3 * (n30 + n12) ** 2 - (n21 + n03) ** 2
    )
    return np.array([h1, h2, h3, h4, h5, h6, h7])


def match_shapes(mask_a: np.ndarray, mask_b: np.ndarray) -> float:
    """OpenCV ``matchShapes`` (I1 method): Σ |1/sgn·log|hA| − 1/sgn·log|hB||
    over the Hu moments — 0 for identical shapes, small for similar."""
    ha = hu_moments(mask_a)
    hb = hu_moments(mask_b)
    eps = 1e-30
    sa = np.sign(ha)
    sb = np.sign(hb)
    ma = sa * np.log10(np.abs(ha) + eps)
    mb = sb * np.log10(np.abs(hb) + eps)
    use = (np.abs(ha) > 1e-12) & (np.abs(hb) > 1e-12)
    if not use.any():
        return 0.0
    return float(np.abs(1.0 / ma[use] - 1.0 / mb[use]).sum())


def moments(mask: np.ndarray) -> dict:
    """Raw spatial moments of a u8 mask/image (OpenCV ``moments`` m00/m10/
    m01 + centroid; values weighted, exact int64)."""
    a = mask.astype(np.int64)
    h, w = a.shape[:2]
    if a.ndim == 3:
        a = a[..., 0]
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    m00 = int(a.sum())
    m10 = int((a * xs[None, :]).sum())
    m01 = int((a * ys[:, None]).sum())
    out = {"m00": m00, "m10": m10, "m01": m01}
    if m00 > 0:
        out["centroid"] = (m10 / m00, m01 / m00)
    return out


# Bayer CFA patterns: (row%2, col%2) → channel at that site. Keys match
# PixelFormat.BAYER_*; the reference enumerates these FourCCs
# (rustcv-core/src/pixel_format.rs:36-79) but never demosaics — spec frozen
# here: integer bilinear demosaic, replicate border,
# avg2 = (a+b+1)>>1, avg4 = (Σ+2)>>2.
BAYER_PATTERNS = {
    "BGGR": {"r": (1, 1), "b": (0, 0)},
    "GBRG": {"r": (1, 0), "b": (0, 1)},
    "GRBG": {"r": (0, 1), "b": (1, 0)},
    "RGGB": {"r": (0, 0), "b": (1, 1)},
}


def mosaic_bayer(bgr: np.ndarray, pattern: str) -> np.ndarray:
    """BGR → raw Bayer mosaic (H, W) u8 by sampling the site channel."""
    spec = BAYER_PATTERNS[pattern]
    h, w = bgr.shape[:2]
    ys = np.arange(h)[:, None] % 2
    xs = np.arange(w)[None, :] % 2
    r_site = (ys == spec["r"][0]) & (xs == spec["r"][1])
    b_site = (ys == spec["b"][0]) & (xs == spec["b"][1])
    out = bgr[..., 1].copy()  # green everywhere else
    out[r_site] = bgr[..., 2][r_site]
    out[b_site] = bgr[..., 0][b_site]
    return out


def demosaic_bilinear(raw: np.ndarray, pattern: str) -> np.ndarray:
    """Integer bilinear demosaic (frozen spec) → BGR (H, W, 3) u8.

    Border: reflect-101 (mirror about the edge pixel) — unlike replicate it
    preserves CFA site parity, so borders demosaic with correct colors.
    Requires H, W ≥ 2.
    """
    spec = BAYER_PATTERNS[pattern]
    h, w = raw.shape
    a = raw.astype(np.int32)
    p = np.pad(a, 1, mode="reflect")
    cross = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    diag = p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]
    horiz = p[1:-1, :-2] + p[1:-1, 2:]
    vert = p[:-2, 1:-1] + p[2:, 1:-1]
    g4 = (cross + 2) >> 2
    h2 = (horiz + 1) >> 1
    v2 = (vert + 1) >> 1
    d4 = (diag + 2) >> 2

    ys = np.arange(h)[:, None] % 2
    xs = np.arange(w)[None, :] % 2
    mr = (ys == spec["r"][0]) & (xs == spec["r"][1])
    mb = (ys == spec["b"][0]) & (xs == spec["b"][1])
    g_in_red_row = (~mr & ~mb) & (ys == spec["r"][0])
    g_in_blue_row = (~mr & ~mb) & (ys == spec["b"][0])

    r = np.where(mr, a, np.where(g_in_red_row, h2, np.where(g_in_blue_row, v2, d4)))
    b = np.where(mb, a, np.where(g_in_blue_row, h2, np.where(g_in_red_row, v2, d4)))
    g = np.where(mr | mb, g4, a)
    out = np.stack([b, g, r], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Drawing (imgproc)
# ---------------------------------------------------------------------------


def rectangle(
    data: np.ndarray,
    rows: int,
    cols: int,
    step: int,
    rect_xywh: tuple,
    color_bgr: tuple,
    thickness: int,
) -> None:
    """In-place rectangle with the reference's exact semantics.

    Faithful port of ``rustcv/src/imgproc/drawing.rs:67-106`` including its
    quirks: edges may overdraw past the opposite side for large ``thickness``
    (bounded only by the flat-buffer index check), and negative coordinates
    from ``y_max-1-t`` / usize-cast are skipped.

    ``data``: flat u8 buffer of length rows*step (or a (rows, step) array).
    """
    flat = data.reshape(-1)
    n = flat.shape[0]
    x, y, w, h = rect_xywh
    b, g, r = color_bgr

    x_min = max(x, 0)
    y_min = max(y, 0)
    x_max = min(x + w, cols)
    y_max = min(y + h, rows)
    if x_min >= x_max or y_min >= y_max:
        return

    def set_px(rr: int, cc: int) -> None:
        if rr < 0 or cc < 0:  # Rust: usize cast wraps → idx check fails
            return
        idx = rr * step + cc * 3
        if idx + 2 < n:
            flat[idx] = b
            flat[idx + 1] = g
            flat[idx + 2] = r

    for c in range(x_min, x_max):  # top & bottom edges
        for t in range(thickness):
            set_px(y_min + t, c)
            set_px(y_max - 1 - t, c)
    for rr in range(y_min, y_max):  # left & right edges
        for t in range(thickness):
            set_px(rr, x_min + t)
            set_px(rr, x_max - 1 - t)


def blend_mask(
    img: np.ndarray, mask: np.ndarray, x0: int, y0: int, color_bgr: tuple
) -> None:
    """Alpha-blend a coverage mask onto a BGR image, in place.

    Frozen integer spec of the reference's float blend
    (``drawing.rs:123-163``: new = color*α + old*(1-α), truncated):
    with a ∈ [0,255]:  ``new = (color*a + old*(255-a)) // 255``.
    Integer division is exact and platform-independent; differences vs the
    float original are ≤1 LSB and only at truncation boundaries.

    ``img``: (rows, cols, 3) u8 view; ``mask``: (mh, mw) u8 coverage;
    (x0, y0): top-left placement. Out-of-bounds parts are clipped.
    """
    rows, cols = img.shape[:2]
    mh, mw = mask.shape
    sy, sx = max(0, -y0), max(0, -x0)
    ey = min(mh, rows - y0)
    ex = min(mw, cols - x0)
    if sy >= ey or sx >= ex:
        return
    sub = img[y0 + sy : y0 + ey, x0 + sx : x0 + ex].astype(np.int32)
    a = mask[sy:ey, sx:ex].astype(np.int32)[..., None]
    color = np.array(color_bgr, dtype=np.int32)
    blended = (color * a + sub * (255 - a)) // 255
    img[y0 + sy : y0 + ey, x0 + sx : x0 + ex] = blended.astype(np.uint8)


def _window_reduce(img: np.ndarray, ksize: int, fn) -> np.ndarray:
    """k×k windowed reduce with replicate border (morphology helper)."""
    r = ksize // 2
    p = _replicate_pad(img.astype(np.int32), r, r)
    h, w = img.shape[:2]
    acc = None
    for dy in range(ksize):
        for dx in range(ksize):
            sl = p[dy : dy + h, dx : dx + w]
            acc = sl if acc is None else fn(acc, sl)
    return acc.astype(np.uint8)


def erode(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    """k×k erosion (window minimum), replicate border. Frozen spec (the
    reference has no morphology)."""
    return _window_reduce(img, ksize, np.minimum)


def dilate(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    """k×k dilation (window maximum), replicate border."""
    return _window_reduce(img, ksize, np.maximum)


MORPH_OPS = ("open", "close", "gradient", "tophat", "blackhat")


def morphology_ex(img: np.ndarray, op: str, ksize: int = 3) -> np.ndarray:
    """Compound morphology (OpenCV ``morphologyEx`` role). Frozen spec:
    open = dilate(erode), close = erode(dilate), gradient = dilate − erode,
    tophat = img − open, blackhat = close − img — every difference is
    non-negative by construction, so u8 arithmetic is exact."""
    if op == "open":
        return dilate(erode(img, ksize), ksize)
    if op == "close":
        return erode(dilate(img, ksize), ksize)
    a = img.astype(np.int32)
    if op == "gradient":
        out = dilate(img, ksize).astype(np.int32) - erode(img, ksize)
    elif op == "tophat":
        out = a - morphology_ex(img, "open", ksize)
    elif op == "blackhat":
        out = morphology_ex(img, "close", ksize).astype(np.int32) - a
    else:
        raise ValueError(f"unknown morphology op {op!r} (one of {MORPH_OPS})")
    return out.astype(np.uint8)


def filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Arbitrary-kernel correlation (OpenCV ``filter2D`` role). Frozen
    spec: float64 correlate with replicate border, round half to even,
    clamp to u8. Kernel is odd-sided, anchored at its center."""
    kh, kw = kernel.shape
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("kernel sides must be odd")
    ry, rx = kh // 2, kw // 2
    h, w = img.shape[:2]
    pad = ((ry, ry), (rx, rx)) + ((0, 0),) * (img.ndim - 2)
    p = np.pad(img.astype(np.float64), pad, mode="edge")
    acc = np.zeros(img.shape, np.float64)
    for dy in range(kh):
        for dx in range(kw):
            acc += kernel[dy, dx] * p[dy : dy + h, dx : dx + w]
    return np.clip(np.rint(acc), 0, 255).astype(np.uint8)


def integral(img: np.ndarray) -> np.ndarray:
    """Summed-area table (OpenCV ``integral`` role): (H+1, W+1) int64 with
    a zero top row / left column; S[y, x] = Σ img[:y, :x]."""
    s = np.cumsum(np.cumsum(img.astype(np.int64), axis=0), axis=1)
    return np.pad(s, ((1, 0), (1, 0)))


def median3(img: np.ndarray) -> np.ndarray:
    """3×3 median filter, replicate border (exact integer median of 9)."""
    return median_k(img, 3)


def median_k(img: np.ndarray, k: int) -> np.ndarray:
    """k×k median (odd k), replicate border — sorted[k²//2] of the window
    (odd tap count → np.median is the exact integer order statistic)."""
    if k % 2 != 1 or k < 1:
        raise ValueError(f"median_k: odd k required, got {k}")
    r = k // 2
    p = _replicate_pad(img.astype(np.uint8), r, r)
    h, w = img.shape[:2]
    taps = np.stack(
        [p[dy : dy + h, dx : dx + w] for dy in range(k) for dx in range(k)], axis=0
    )
    return np.median(taps, axis=0).astype(np.uint8)


THRESH_BINARY = "binary"
THRESH_BINARY_INV = "binary_inv"
THRESH_TRUNC = "trunc"
THRESH_TOZERO = "tozero"
THRESH_TOZERO_INV = "tozero_inv"


def threshold(img: np.ndarray, thresh: int, maxval: int, type: str = THRESH_BINARY) -> np.ndarray:
    """OpenCV-style threshold (frozen spec; strict ``> thresh`` comparison).

    The reference has no threshold op — spec frozen here for API
    completeness. u8 in/out, element-wise.
    """
    a = img.astype(np.int32)
    above = a > thresh
    if type == THRESH_BINARY:
        out = np.where(above, maxval, 0)
    elif type == THRESH_BINARY_INV:
        out = np.where(above, 0, maxval)
    elif type == THRESH_TRUNC:
        out = np.where(above, thresh, a)
    elif type == THRESH_TOZERO:
        out = np.where(above, a, 0)
    elif type == THRESH_TOZERO_INV:
        out = np.where(above, 0, a)
    else:
        raise ValueError(f"unknown threshold type {type!r}")
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Resize (frozen fixed-point bilinear)
# ---------------------------------------------------------------------------

RESIZE_SHIFT = 11  # 11-bit fixed-point weights (OpenCV-style precision)
RESIZE_ONE = 1 << RESIZE_SHIFT


def resize_coeffs(src_size: int, dst_size: int):
    """Per-output-pixel (lo_index, weight_hi) tables, frozen spec.

    Half-pixel centers: fx = (dx + 0.5) * src/dst - 0.5 (float64 on host),
    ix = floor(fx) clamped to [0, src-2] (so ix+1 is valid; for src==1 both
    taps are pixel 0), w_hi = round((fx - ix_unclamped_frac) * 2048) computed
    from the clamped position.
    """
    dx = np.arange(dst_size, dtype=np.float64)
    fx = (dx + 0.5) * (src_size / dst_size) - 0.5
    ix = np.floor(fx).astype(np.int64)
    # Clamp: fx < 0 → pixel 0 with frac 0; ix ≥ src-1 → pixels src-2, src-1
    ix = np.clip(ix, 0, max(src_size - 2, 0))
    fx_clamped = np.minimum(fx, src_size - 1)
    frac = np.clip(fx_clamped - ix, 0.0, 1.0)
    w_hi = np.round(frac * RESIZE_ONE).astype(np.int32)
    return ix.astype(np.int32), w_hi


def resize_bilinear(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Fixed-point separable bilinear resize, frozen spec.

    Horizontal pass keeps unshifted 11-bit sums (≤ 2048*255, fits i32);
    vertical pass rounds once: ``(Σ + 2^21) >> 22``.
    """
    src_h, src_w = img.shape[:2]
    x_lo, x_whi = resize_coeffs(src_w, dst_w)
    y_lo, y_whi = resize_coeffs(src_h, dst_h)
    x_hi = np.minimum(x_lo + 1, src_w - 1)
    y_hi = np.minimum(y_lo + 1, src_h - 1)

    a = img.astype(np.int32)
    # Horizontal: (H_src, W_dst, C)
    tmp = a[:, x_lo] * (RESIZE_ONE - x_whi)[None, :, None] + a[:, x_hi] * x_whi[None, :, None]
    # Vertical: (H_dst, W_dst, C)
    acc = (
        tmp[y_lo] * (RESIZE_ONE - y_whi)[:, None, None]
        + tmp[y_hi] * y_whi[:, None, None]
    )
    out = (acc + (1 << (2 * RESIZE_SHIFT - 1))) >> (2 * RESIZE_SHIFT)
    return np.clip(out, 0, 255).astype(np.uint8)


def resize_bicubic_coeffs(src_size: int, dst_size: int):
    """Per-output-pixel 4-tap tables for INTER_CUBIC (a = −0.75, OpenCV's
    kernel), frozen spec. Half-pixel centers as resize_coeffs; taps at
    ix−1..ix+2 CLAMPED to [0, src−1] (replicate border). Weights w(x) for
    |x|≤1: (a+2)|x|³ − (a+3)|x|² + 1; 1<|x|<2: a(|x|³ − 5|x|² + 8|x| − 4);
    quantized to 11-bit with w1 = 2048 − (w0+w2+w3) so flat regions are
    exact. Returns (tap_idx int32 [dst, 4], weights int32 [dst, 4])."""
    a = -0.75
    dx = np.arange(dst_size, dtype=np.float64)
    fx = (dx + 0.5) * (src_size / dst_size) - 0.5
    ix = np.floor(fx).astype(np.int64)
    f = fx - ix

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0,
            (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
            np.where(x < 2.0, a * (x**3 - 5.0 * x**2 + 8.0 * x - 4.0), 0.0),
        )

    w = np.stack([k(f + 1.0), k(f), k(1.0 - f), k(2.0 - f)], axis=-1)
    wq = np.round(w * RESIZE_ONE).astype(np.int64)
    wq[:, 1] = RESIZE_ONE - (wq[:, 0] + wq[:, 2] + wq[:, 3])
    taps = ix[:, None] + np.arange(-1, 3)[None, :]
    taps = np.clip(taps, 0, src_size - 1)
    return taps.astype(np.int32), wq.astype(np.int32)


def resize_bicubic(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Fixed-point separable bicubic resize (INTER_CUBIC role), frozen
    spec. Horizontal pass keeps unshifted 11-bit sums; vertical rounds
    once: ``(Σ + 2^21) >> 22``, clamped to u8. i32 bound: |Σ|w|| ≤
    1.281·2048 per axis → |acc| ≤ 255·(1.281·2048)² ≈ 1.76e9 < 2³¹.
    Works on (H, W) gray or (H, W, C)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    xt, xw = resize_bicubic_coeffs(img.shape[1], dst_w)
    yt, yw = resize_bicubic_coeffs(img.shape[0], dst_h)
    a = img.astype(np.int64)
    tmp = sum(a[:, xt[:, j]] * xw[:, j][None, :, None] for j in range(4))
    acc = sum(tmp[yt[:, j]] * yw[:, j][:, None, None] for j in range(4))
    out = (acc + (1 << (2 * RESIZE_SHIFT - 1))) >> (2 * RESIZE_SHIFT)
    out = np.clip(out, 0, 255).astype(np.uint8)
    return out[..., 0] if squeeze else out


def resize_nearest_coeffs(src_size: int, dst_size: int) -> np.ndarray:
    """Frozen nearest-neighbor tap table: half-pixel centers,
    src = min(floor((d + 0.5) · src/dst), src − 1) in float64."""
    d = np.arange(dst_size, dtype=np.float64)
    ix = np.floor((d + 0.5) * (src_size / dst_size)).astype(np.int64)
    return np.minimum(ix, src_size - 1).astype(np.int32)


def resize_nearest(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Nearest-neighbor resize, frozen spec (exact pixel copies)."""
    sx = resize_nearest_coeffs(img.shape[1], dst_w)
    sy = resize_nearest_coeffs(img.shape[0], dst_h)
    return img[sy][:, sx]


def resize_area(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Area (box-mean) resize, frozen spec.

    Integer downscale factors: exact k×k box mean with round-half-up
    ``(Σ + n/2) // n``. Any other ratio falls back to the bilinear spec
    (OpenCV makes the same integer-factor distinction for INTER_AREA).
    """
    src_h, src_w = img.shape[:2]
    if (
        dst_w <= src_w and dst_h <= src_h
        and src_w % dst_w == 0 and src_h % dst_h == 0
    ):
        ky, kx = src_h // dst_h, src_w // dst_w
        s = img.astype(np.int64).reshape(dst_h, ky, dst_w, kx, -1).sum(axis=(1, 3))
        n = kx * ky
        out = (s + n // 2) // n
        return np.clip(out, 0, 255).astype(np.uint8).reshape(dst_h, dst_w, *img.shape[2:])
    return resize_bilinear(img, dst_w, dst_h)


# ---------------------------------------------------------------------------
# Filters (frozen integer specs)
# ---------------------------------------------------------------------------

GAUSS5 = np.array([1, 4, 6, 4, 1], dtype=np.int32)  # per-axis, sum 16


def _replicate_pad(a: np.ndarray, ry: int, rx: int) -> np.ndarray:
    pad = [(ry, ry), (rx, rx)] + [(0, 0)] * (a.ndim - 2)
    return np.pad(a, pad, mode="edge")


def gaussian5_u8(img: np.ndarray) -> np.ndarray:
    """5×5 Gaussian ([1,4,6,4,1]⊗[1,4,6,4,1] / 256), replicate border,
    single final rounding (Σ + 128) >> 8. Works on (H,W) or (H,W,C) u8."""
    a = img.astype(np.int32)
    p = _replicate_pad(a, 2, 2)
    h, w = img.shape[:2]
    # Horizontal taps (unshifted, ≤ 16*255)
    tmp = sum(int(GAUSS5[k]) * p[:, k : k + w] for k in range(5))
    # Vertical taps + single rounding (≤ 256*255)
    acc = sum(int(GAUSS5[k]) * tmp[k : k + h] for k in range(5))
    return ((acc + 128) >> 8).astype(np.uint8)


def stack_blur_u8(img: np.ndarray, kw: int, kh: int = None) -> np.ndarray:
    """StackBlur frozen spec: separable triangular filter (weights
    r+1−|i|, |i| ≤ r per axis), replicate border, per-pass fixed-point
    division out = (Σ · mul) >> shr with shr = 9 + floor(log2((r+1)²)),
    mul = ceil(2^shr / (r+1)²) — the stackblur divider reconstructed from
    its defining formula. OpenCV's cv2.stackBlur matches within ±1 LSB
    per pass (its SIMD body rounds the shift, its scalar tail truncates —
    bit-exactness is build-dependent there, so the truncating scalar form
    is frozen here). Works on (H, W) or (H, W, C) u8."""
    if kh is None:
        kh = kw
    rw, rh = kw // 2, kh // 2
    a = img.astype(np.int64)
    h, w = img.shape[:2]

    def divider(r):
        div = (r + 1) * (r + 1)
        shr = 9 + (div.bit_length() - 1)
        return -(-(1 << shr) // div), shr

    p = _replicate_pad(a, 0, rw)
    tri = sum((rw + 1 - abs(i)) * p[:, rw + i : rw + i + w]
              for i in range(-rw, rw + 1))
    mul, shr = divider(rw)
    hmid = (tri * mul) >> shr
    p = _replicate_pad(hmid, rh, 0)
    tri = sum((rh + 1 - abs(i)) * p[rh + i : rh + i + h]
              for i in range(-rh, rh + 1))
    mul, shr = divider(rh)
    return ((tri * mul) >> shr).astype(np.uint8)


def line_mask(
    h: int, w: int, p1: tuple, p2: tuple, thickness: int = 1
) -> np.ndarray:
    """Frozen line-stroke mask (exact INT32-SAFE spec — products stay
    below 2^31 for coordinates up to 8K, so the device needs no int64):

    - body: 0 ≤ dot(AP, AB) ≤ |AB|² and (2·|cross(AP, AB)|) // isqrt(|AB|²)
      ≤ thickness (the floored perpendicular-distance test);
    - caps: 4·|P−A|² ≤ t² or 4·|P−B|² ≤ t² (round endpoints);
    - degenerate (A == B): caps only.
    """
    ax, ay = int(p1[0]), int(p1[1])
    bx, by = int(p2[0]), int(p2[1])
    ys, xs = np.mgrid[0:h, 0:w]
    px = xs.astype(np.int64)
    py = ys.astype(np.int64)
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    ab2 = abx * abx + aby * aby
    t = int(thickness)
    t2 = t * t
    bpx, bpy = px - bx, py - by
    caps = (4 * (apx * apx + apy * apy) <= t2) | (
        4 * (bpx * bpx + bpy * bpy) <= t2
    )
    if ab2 == 0:
        return caps.astype(np.uint8) * 255
    s = int(np.floor(np.sqrt(ab2)))  # isqrt(|AB|²)
    dot = apx * abx + apy * aby
    cross = np.abs(apx * aby - apy * abx)
    body = (dot >= 0) & (dot <= ab2) & ((2 * cross) // s <= t)
    return ((body | caps).astype(np.uint8)) * 255


def circle_mask(
    h: int, w: int, center: tuple, radius: int, thickness: int = 1
) -> np.ndarray:
    """Frozen circle mask: filled when thickness < 0 (|P−C|² ≤ R²), else a
    ring (2|P−C| within [2R−t, 2R+t], exact via squared comparisons)."""
    cx, cy = int(center[0]), int(center[1])
    r = int(radius)
    ys, xs = np.mgrid[0:h, 0:w]
    d2 = (xs.astype(np.int64) - cx) ** 2 + (ys.astype(np.int64) - cy) ** 2
    if thickness < 0:
        return (d2 <= r * r).astype(np.uint8) * 255
    t = int(thickness)
    lo = max(0, 2 * r - t)
    hi = 2 * r + t
    return ((4 * d2 >= lo * lo) & (4 * d2 <= hi * hi)).astype(np.uint8) * 255


def adaptive_threshold(
    gray: np.ndarray,
    maxval: int = 255,
    method: str = "mean",
    block: int = 11,
    c: int = 2,
    inv: bool = False,
) -> np.ndarray:
    """Frozen adaptive threshold (OpenCV ``adaptiveThreshold`` role):
    T = neighborhood mean (rounded k×k box, replicate border; ``method=
    "gaussian"`` uses the 5×5 Gaussian spec regardless of ``block``) − c;
    out = maxval where gray > T (or ≤ T when ``inv``)."""
    if method == "mean":
        r = block // 2
        p = _replicate_pad(gray.astype(np.int64), r, r)
        h, w = gray.shape[:2]
        acc = np.zeros(gray.shape, np.int64)
        for dy in range(block):
            for dx in range(block):
                acc += p[dy : dy + h, dx : dx + w]
        n = block * block
        t = (acc + n // 2) // n
    elif method == "gaussian":
        t = gaussian5_u8(gray).astype(np.int64)
    else:
        raise ValueError(f"unknown method {method!r} (mean, gaussian)")
    above = gray.astype(np.int64) > t - c
    if inv:
        above = ~above
    return np.where(above, maxval, 0).astype(np.uint8)


BILATERAL_SPATIAL5 = np.outer(GAUSS5, GAUSS5).astype(np.int64)  # max 36


def bilateral_range_weight(d: np.ndarray, sigma: int = 25) -> np.ndarray:
    """Frozen range kernel: integer quadratic ramp approximating a
    Gaussian — r(d) = max(0, 64 − d²//S), S = max(1, (2σ²)//64). All
    integer (no exp, no lookup), so device == oracle bit-for-bit."""
    s = max(1, (2 * sigma * sigma) // 64)
    return np.maximum(0, 64 - (d.astype(np.int64) ** 2) // s)


def bilateral5_u8(gray: np.ndarray, sigma: int = 25) -> np.ndarray:
    """Frozen 5×5 bilateral filter: w = spatial(1,4,6,4,1)⊗ ·
    range(|v−center|); out = (Σ w·v + W/2) // W (exact integer;
    Σ w·v ≤ 14.7M so everything fits int32 on device)."""
    a = gray.astype(np.int64)
    p = _replicate_pad(a, 2, 2)
    h, w = gray.shape[:2]
    num = np.zeros(gray.shape, np.int64)
    den = np.zeros(gray.shape, np.int64)
    for dy in range(5):
        for dx in range(5):
            v = p[dy : dy + h, dx : dx + w]
            wt = BILATERAL_SPATIAL5[dy, dx] * bilateral_range_weight(
                np.abs(v - a), sigma
            )
            num += wt * v
            den += wt
    return np.clip((num + den // 2) // den, 0, 255).astype(np.uint8)


def pyr_down(img: np.ndarray) -> np.ndarray:
    """Image-pyramid downsample, frozen spec: the 5×5 Gaussian
    (:func:`gaussian5_u8`, replicate border) followed by even-index
    decimation — output is ceil(H/2) × ceil(W/2) (OpenCV pyrDown shape)."""
    return gaussian5_u8(img)[::2, ::2]


def sobel3_gray(gray: np.ndarray):
    """Sobel 3×3 gx/gy on u8 gray, replicate border → int32 (range ±1020).

    gx = [[-1,0,1],[-2,0,2],[-1,0,1]], gy = gxᵀ (y increasing downward).
    """
    a = gray.astype(np.int32)
    p = _replicate_pad(a, 1, 1)
    h, w = gray.shape
    # Separable: gx = [1,2,1]ᵥ ⊗ [-1,0,1]ₕ ; gy = [-1,0,1]ᵥ ⊗ [1,2,1]ₕ
    smooth_v = p[0 : h, :] + 2 * p[1 : h + 1, :] + p[2 : h + 2, :]
    diff_v = p[2 : h + 2, :] - p[0 : h, :]
    gx = smooth_v[:, 2 : w + 2] - smooth_v[:, 0:w]
    gy = diff_v[:, 0:w] + 2 * diff_v[:, 1 : w + 1] + diff_v[:, 2 : w + 2]
    return gx, gy


def isqrt_u32(x: np.ndarray) -> np.ndarray:
    """Exact floor integer sqrt for x ≤ ~2.1e9 (vectorized)."""
    s = np.sqrt(x.astype(np.float64)).astype(np.int64)
    # float64 sqrt of ints < 2^53 is exact enough that one fix-up suffices
    s = np.where((s + 1) * (s + 1) <= x, s + 1, s)
    s = np.where(s * s > x, s - 1, s)
    return s


def gradient_magnitude_u8(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Frozen spec: min(255, isqrt(gx² + gy²)) — fully integer, exact."""
    mag2 = gx.astype(np.int64) ** 2 + gy.astype(np.int64) ** 2
    return np.minimum(isqrt_u32(mag2), 255).astype(np.uint8)


CANNY_HYST_ROUNDS = 16  # bounded 8-connected hysteresis propagation


def canny(gray_u8: np.ndarray, low: int = 40, high: int = 90) -> np.ndarray:
    """Canny edge detector — frozen integer spec (the reference has none).

    gray → Gaussian5 (frozen) → Sobel → full-range isqrt magnitude →
    gradient-direction NMS with fixed-point sector quantization
    (tan 22.5° ≈ 27146/65536, tan 67.5° ≈ 158218/65536; out-of-image
    neighbors are 0; ties kept with ≥) → double threshold (strict >) →
    bounded hysteresis (CANNY_HYST_ROUNDS rounds of 3×3 dilation of the
    strong set masked by the weak set). Output: u8 mask (255/0).
    """
    blurred = gaussian5_u8(gray_u8)
    gx, gy = sobel3_gray(blurred)
    mag = isqrt_u32(gx.astype(np.int64) ** 2 + gy.astype(np.int64) ** 2).astype(np.int32)

    a = np.abs(gx)
    b = np.abs(gy)
    sector0 = (b << 16) <= a * 27146                    # ~horizontal gradient
    sector2 = (b << 16) >= a * 158218                   # ~vertical gradient
    diag_main = (~sector0) & (~sector2) & (gx * gy >= 0)  # "\" direction
    diag_anti = (~sector0) & (~sector2) & (gx * gy < 0)   # "/" direction

    h, w = mag.shape
    p = np.zeros((h + 2, w + 2), np.int32)
    p[1:-1, 1:-1] = mag

    def nb(dy, dx):
        return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    n1 = np.where(sector0, nb(0, -1), 0)
    n2 = np.where(sector0, nb(0, 1), 0)
    n1 = np.where(sector2, nb(-1, 0), n1)
    n2 = np.where(sector2, nb(1, 0), n2)
    n1 = np.where(diag_main, nb(-1, -1), n1)
    n2 = np.where(diag_main, nb(1, 1), n2)
    n1 = np.where(diag_anti, nb(-1, 1), n1)
    n2 = np.where(diag_anti, nb(1, -1), n2)
    keep = (mag >= n1) & (mag >= n2)
    nms = np.where(keep, mag, 0)

    strong = nms > high
    weak = nms > low
    for _ in range(CANNY_HYST_ROUNDS):
        grown = dilate((strong * 255).astype(np.uint8), 3) > 0
        new_strong = strong | (weak & grown)
        if (new_strong == strong).all():
            strong = new_strong
            break
        strong = new_strong
    return (strong * 255).astype(np.uint8)


def blur_sobel_mag_u8(img_bgr: np.ndarray) -> np.ndarray:
    """BASELINE config-3 fused oracle: gray → Gaussian5 → Sobel → |∇| u8."""
    gray = bgr_to_gray(img_bgr)
    blurred = gaussian5_u8(gray)
    gx, gy = sobel3_gray(blurred)
    return gradient_magnitude_u8(gx, gy)


# ---------------------------------------------------------------------------
# Harris corners (float32 — positional parity; see ops/features.py)
# ---------------------------------------------------------------------------


def harris_response(gray_u8: np.ndarray, k: float = 0.04) -> np.ndarray:
    """Harris corner response, float32.

    gray → Sobel gradients (integer, exact) → per-pixel products → 5×5
    Gaussian window (float32, normalized /256) → R = det(M) − k·trace(M)².
    Normalized by 1/(255·4)⁴ so responses are O(1) regardless of image scale.
    """
    gx, gy = sobel3_gray(gray_u8)
    norm = np.float32(1.0 / (255.0 * 4.0))
    fx = gx.astype(np.float32) * norm
    fy = gy.astype(np.float32) * norm
    ixx, iyy, ixy = fx * fx, fy * fy, fx * fy

    w = (GAUSS5.astype(np.float32) / 16.0)

    def smooth(m):
        p = _replicate_pad(m, 2, 2)
        h, ww = m.shape
        tmp = sum(w[i] * p[:, i : i + ww] for i in range(5))
        return sum(w[i] * tmp[i : i + h] for i in range(5))

    sxx, syy, sxy = smooth(ixx), smooth(iyy), smooth(ixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - np.float32(k) * tr * tr


def harris_response_i32(gray_u8: np.ndarray, k_num: int = 41) -> np.ndarray:
    """Fixed-point Harris response — the FROZEN integer spec (bit-exact on
    every platform; no float reassociation anywhere).

    Arithmetic (all int32-safe; computed here in int64 and cast, which is
    identical because no intermediate overflows i32):

    - ``gx, gy`` = exact integer Sobel (|·| ≤ 1020).
    - products ``pxx=gx², pyy=gy², pxy=gx·gy`` (|·| ≤ 1 040 400).
    - window: separable 5×5 integer Gaussian taps (1,4,6,4,1) (sum 256),
      replicate border, one rounding shift ``s = (Σ + 128) >> 8``
      (arithmetic shift, i.e. floor — matters for negative ``pxy`` sums);
      |s| ≤ 1 040 400.
    - headroom shift: ``s5 = s >> 5`` (|·| ≤ 32 513) so every following
      product fits i32.
    - ``det = sxx5·syy5 − sxy5²`` (|·| ≤ 2³¹−1), ``trh = (sxx5+syy5) >> 1``,
      ``R = det − k_num·((trh·trh) >> 8)``.

    ``k_num`` is Harris k in units of 1/1024 (41/1024 ≈ 0.04 — the classic
    default). The response is a monotone relabeling of the float response up
    to fixed-point quantization; corners are defined on THIS lattice.
    """
    gx, gy = sobel3_gray(gray_u8)
    gx = gx.astype(np.int64)
    gy = gy.astype(np.int64)

    def smooth_i(m: np.ndarray) -> np.ndarray:
        p = _replicate_pad(m, 2, 2)
        h, w = m.shape
        taps = (1, 4, 6, 4, 1)
        tmp = sum(t * p[:, i : i + w] for i, t in enumerate(taps))
        acc = sum(t * tmp[i : i + h] for i, t in enumerate(taps))
        return (acc + 128) >> 8

    sxx5 = smooth_i(gx * gx) >> 5
    syy5 = smooth_i(gy * gy) >> 5
    sxy5 = smooth_i(gx * gy) >> 5
    det = sxx5 * syy5 - sxy5 * sxy5
    trh = (sxx5 + syy5) >> 1
    r = det - k_num * ((trh * trh) >> 8)
    return r.astype(np.int32)


def harris_corners(
    gray_u8: np.ndarray,
    k: float = 0.04,
    threshold_rel: float = 0.01,
    nms_radius: int = 1,
) -> np.ndarray:
    """Corner mask on the integer response (bit-exact spec):
    ``resp > t_num·(max(resp) >> 12)`` AND (2r+1)² local max (ties count as
    maxima), with ``k_num = round(k·1024)``, ``t_num = round(rel·4096)``
    (41/4096 ≈ 1%). max(resp) < 0 (featureless images) yields whatever the
    integer comparison gives — frozen as-is."""
    resp = harris_response_i32(gray_u8, k_num=int(round(k * 1024)))
    t_num = int(round(threshold_rel * 4096))
    thresh = t_num * (int(resp.max()) >> 12)
    r = nms_radius
    p = np.pad(resp, r, mode="constant", constant_values=np.int32(-(2**31)))
    h, w = resp.shape
    local_max = np.ones_like(resp, dtype=bool)
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            if dy == r and dx == r:
                continue
            local_max &= resp >= p[dy : dy + h, dx : dx + w]
    return (resp > thresh) & local_max


def laplacian3(gray: np.ndarray) -> np.ndarray:
    """3×3 Laplacian ([[0,1,0],[1,−4,1],[0,1,0]]), replicate border →
    int32 (frozen spec; OpenCV CV_16S-style signed output)."""
    a = gray.astype(np.int64)
    p = _replicate_pad(a, 1, 1)
    h, w = gray.shape[:2]
    return (
        p[0:h, 1 : w + 1] + p[2 : h + 2, 1 : w + 1]
        + p[1 : h + 1, 0:w] + p[1 : h + 1, 2 : w + 2]
        - 4 * a
    ).astype(np.int32)


def scharr3_gray(gray: np.ndarray):
    """Scharr 3×3 gx/gy (separable [3,10,3]⊗[−1,0,1]), replicate border →
    int32 pair (range ±4080)."""
    a = gray.astype(np.int64)
    p = _replicate_pad(a, 1, 1)
    h, w = gray.shape[:2]
    sm_v = 3 * p[0:h, 1 : w + 1] + 10 * a + 3 * p[2 : h + 2, 1 : w + 1]
    pv = _replicate_pad(sm_v, 0, 1)
    gx = (pv[:, 2 : w + 2] - pv[:, 0:w]).astype(np.int32)
    sm_h = 3 * p[1 : h + 1, 0:w] + 10 * a + 3 * p[1 : h + 1, 2 : w + 2]
    ph = _replicate_pad(sm_h, 1, 0)
    gy = (ph[2 : h + 2, :] - ph[0:h, :]).astype(np.int32)
    return gx, gy


def pyr_up(img: np.ndarray) -> np.ndarray:
    """Image-pyramid upsample to (2H, 2W), frozen spec: the 5x5 binomial
    zero-stuff upsample expressed POLYPHASE on the source with replicate
    border (per axis: even outputs = [1,6,1]*src, odd = [4,4]*src), so
    every output phase carries total weight 64 and a constant image stays
    constant everywhere (incl. borders): (Sigma + 32) >> 6 (OpenCV pyrUp
    role; border mode matches our pyr_down)."""

    def up_axis(a, axis):
        c = a
        left = np.take(a, [0] + list(range(a.shape[axis] - 1)), axis=axis)
        right = np.take(a, list(range(1, a.shape[axis])) + [a.shape[axis] - 1],
                        axis=axis)
        even = left + 6 * c + right          # weight 8
        odd = 4 * (c + right)                # weight 8
        out = np.stack([even, odd], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] *= 2
        return out.reshape(shape)

    acc = up_axis(up_axis(img.astype(np.int32), 1), 0)
    return ((acc + 32) >> 6).clip(0, 255).astype(np.uint8)


def erode_kernel(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Erosion over an arbitrary bool structuring element (replicate
    border) — frozen spec for filters.erode_kernel_u8."""
    return _masked_reduce(img, kernel, np.minimum)


def dilate_kernel(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    return _masked_reduce(img, kernel, np.maximum)


def _masked_reduce(img, kernel, fn):
    k = np.asarray(kernel, bool)
    kh, kw = k.shape
    p = _replicate_pad(img.astype(np.int32), kh // 2, kw // 2)
    h, w = img.shape[:2]
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            if not k[dy, dx]:
                continue
            sl = p[dy : dy + h, dx : dx + w]
            acc = sl if acc is None else fn(acc, sl)
    return acc.astype(np.uint8)


# ---------------------------------------------------------------------------
# Kalman filter (float64 frozen spec)
# ---------------------------------------------------------------------------


def kalman_predict(x, P, A, Q, B=None, u=None):
    """Kalman time update (OpenCV ``KalmanFilter::predict`` semantics,
    modules/video/src/kalman.cpp): x' = A·x (+ B·u), P' = A·P·Aᵀ + Q.
    float64 frozen spec; the reference has no Kalman — this is an
    OpenCV-role addition. Returns (x', P')."""
    x = np.asarray(x, np.float64)
    P = np.asarray(P, np.float64)
    A = np.asarray(A, np.float64)
    xp = A @ x
    if B is not None and u is not None:
        xp = xp + np.asarray(B, np.float64) @ np.asarray(u, np.float64)
    Pp = A @ P @ A.T + np.asarray(Q, np.float64)
    return xp, Pp


def kalman_correct(x, P, z, H, R):
    """Kalman measurement update (OpenCV ``KalmanFilter::correct``):
    S = H·P·Hᵀ + R, K = (solve(S, H·P))ᵀ, x⁺ = x + K(z − H·x),
    P⁺ = P − K·H·P. Returns (x⁺, P⁺, K)."""
    x = np.asarray(x, np.float64)
    P = np.asarray(P, np.float64)
    H = np.asarray(H, np.float64)
    HP = H @ P
    S = HP @ H.T + np.asarray(R, np.float64)
    K = np.linalg.solve(S, HP).T
    innov = np.asarray(z, np.float64) - H @ x
    return x + K @ innov, P - K @ HP, K


# ---------------------------------------------------------------------------
# Polygon fill / ellipse / colormaps / normalize (frozen specs)
# ---------------------------------------------------------------------------


def fill_poly_mask(h: int, w: int, pts) -> np.ndarray:
    """Frozen filled-polygon mask (OpenCV ``fillPoly`` role): even-odd
    interior by the exact-integer +x ray crossing rule, OR'd with the
    thickness-1 stroke of every edge so the boundary is included like
    OpenCV's. Pure int32-safe arithmetic (products ≤ 2^25 at 4K coords) —
    the device twin (ops/draw.fill_poly_packed) is bit-identical.

    ``pts``: [K, 2] integer (x, y) vertices, K ≥ 3."""
    p = np.asarray(pts, np.int64).reshape(-1, 2)
    k = len(p)
    if k < 3:
        raise ValueError("fill_poly needs >= 3 vertices")
    ys, xs = np.mgrid[0:h, 0:w]
    px = xs.astype(np.int64)
    py = ys.astype(np.int64)
    inside = np.zeros((h, w), bool)
    for i in range(k):
        x1, y1 = int(p[i][0]), int(p[i][1])
        x2, y2 = int(p[(i + 1) % k][0]), int(p[(i + 1) % k][1])
        d = y2 - y1
        if d == 0:
            continue
        straddle = (y1 > py) != (y2 > py)
        t = (py - y1) * (x2 - x1) - (px - x1) * d
        inside ^= straddle & ((t > 0) == (d > 0))
    edge = np.zeros((h, w), bool)
    for i in range(k):
        edge |= line_mask(h, w, tuple(p[i]), tuple(p[(i + 1) % k]), 1) > 0
    return ((inside | edge).astype(np.uint8)) * 255


def ellipse_mask(h: int, w: int, center, axes, angle_deg: float,
                 thickness: int = 1) -> np.ndarray:
    """Frozen rotated-ellipse mask (OpenCV ``ellipse`` role, full arc):
    float64 spec — rotate into the ellipse frame with exact-radian
    cos/sin, test u² + v² ≤ 1 with u = x'/a, v = y'/b. ``thickness < 0``
    fills; a ring is inside the (a+⌈t/2⌉, b+⌈t/2⌉) ellipse and outside
    the (a−⌊(t+1)/2⌋, b−⌊(t+1)/2⌋) one (axes clamped at 0). Host-only
    spec: the device path paints this exact mask (put_text precedent)."""
    import math

    cx, cy = float(center[0]), float(center[1])
    a0, b0 = int(axes[0]), int(axes[1])
    th = math.radians(float(angle_deg))
    c, s = math.cos(th), math.sin(th)
    ys, xs = np.mgrid[0:h, 0:w]
    dx = xs.astype(np.float64) - cx
    dy = ys.astype(np.float64) - cy
    rx = dx * c + dy * s
    ry = -dx * s + dy * c

    def inside(a, b):
        if a <= 0 or b <= 0:
            return np.zeros((h, w), bool)
        return (rx / a) ** 2 + (ry / b) ** 2 <= 1.0

    if thickness < 0:
        m = inside(a0, b0)
    else:
        t = int(thickness)
        outer = inside(a0 + (t + 1) // 2, b0 + (t + 1) // 2)
        inner = inside(a0 - (t + 1) // 2, b0 - (t + 1) // 2)
        m = outer & ~inner
    return m.astype(np.uint8) * 255


#: Anchor tables for :func:`colormap_table` — frozen role spec (the
#: reference has no colormaps; OpenCV's tables are GNU-Octave formulas.
#: Ours are linear anchor interpolation, pinned by spec-freeze hash).
#: Each anchor is (position in [0,1], (R, G, B) in [0,1]).
# RGB anchors of the classic GNU-Octave/Matlab colormap FORMULAS (public
# closed forms, verified against OpenCV's output — see colormap_table for
# the construction that reproduces cv2's corner-flattening).
COLORMAP_ANCHORS = {
    "autumn": [(0.0, (1, 0, 0)), (1.0, (1, 1, 0))],
    "bone": [(0.0, (0, 0, 0)), (0.375, (0.3281, 0.3281, 0.4531)),
             (0.75, (0.6562, 0.7812, 0.7812)), (1.0, (1, 1, 1))],
    "cool": [(0.0, (0, 1, 1)), (1.0, (1, 0, 1))],
    "hot": [(0.0, (0, 0, 0)), (0.4, (1, 0, 0)), (0.8, (1, 1, 0)),
            (1.0, (1, 1, 1))],
    "hsv": [(0.0, (1, 0, 0)), (1 / 6, (1, 1, 0)), (2 / 6, (0, 1, 0)),
            (3 / 6, (0, 1, 1)), (4 / 6, (0, 0, 1)), (5 / 6, (1, 0, 1)),
            (1.0, (1, 0, 0))],
    "jet": [(0.0, (0, 0, 0.5)), (0.125, (0, 0, 1)), (0.375, (0, 1, 1)),
            (0.625, (1, 1, 0)), (0.875, (1, 0, 0)), (1.0, (0.5, 0, 0))],
    "ocean": [(0.0, (0, 0, 0)), (1 / 3, (0, 0, 1 / 3)),
              (2 / 3, (0, 0.5, 2 / 3)), (1.0, (1, 1, 1))],
    "rainbow": [(0.0, (1, 0, 0)), (0.4, (1, 1, 0)), (0.6, (0, 1, 0)),
                (0.8, (0, 0, 1)), (1.0, (2 / 3, 0, 1))],
    "spring": [(0.0, (1, 0, 1)), (1.0, (1, 1, 0))],
    "summer": [(0.0, (0, 0.5, 0.4)), (1.0, (1, 1, 0.4))],
    "winter": [(0.0, (0, 0, 1)), (1.0, (0, 1, 0.5))],
    "gray": [(0.0, (0, 0, 0)), (1.0, (1, 1, 1))],
    "pink": None,  # sqrt((2x + hot_matlab(x)) / 3) — built in colormap_table
}

#: Matplotlib-table maps that OpenCV ships verbatim (cv2's tables match
#: matplotlib's 256-entry data bit-for-bit; twilight pair within ±2 —
#: tests/test_cv2_shim.py). Kept out of COLORMAP_ANCHORS: they are data,
#: not formulas, and require matplotlib at call time.
COLORMAP_MPL = ("viridis", "turbo", "magma", "inferno", "plasma",
                "cividis", "twilight", "twilight_shifted")


def _colormap_rgb64(name: str) -> np.ndarray:
    """The 64-sample RGB curve (float in [0,1]) of colormap ``name`` —
    OpenCV builds its tables by sampling the Octave formula at n=64 and
    linearly interpolating to 256, which flattens corners that miss the
    64-grid; reproducing the construction reproduces its tables."""
    x = np.arange(64, dtype=np.float64) / 63.0
    if name == "pink":
        # matlab pink = sqrt((2·gray + hot)/3) with matlab hot
        # (breakpoints 3/8, 3/4)
        hot = np.stack([
            np.clip(8 * x / 3, 0, 1),
            np.clip(8 * (x - 3 / 8) / 3, 0, 1),
            np.clip(4 * (x - 3 / 4), 0, 1),
        ], axis=1)
        return np.sqrt((2 * x[:, None] + hot) / 3)
    anchors = COLORMAP_ANCHORS[name]
    xs = np.array([a[0] for a in anchors], np.float64)
    rgb = np.array([a[1] for a in anchors], np.float64)
    return np.stack([np.interp(x, xs, rgb[:, c]) for c in range(3)], axis=1)


def colormap_table(name: str) -> np.ndarray:
    """256×3 u8 **BGR** lookup table for colormap ``name``.

    Formula maps (:data:`COLORMAP_ANCHORS`): cv2's construction —
    64-sample the formula, lerp to 256, round half-away. Matches
    cv2.applyColorMap bit-for-bit for autumn/spring/cool/hsv/pink, ±1 LSB
    for the rest (cv2 rounds through float32). ``jet`` keeps the direct
    256-point anchor interpolation (±1 of cv2; the matlab jet(64) stepped
    construction differs from its continuous form by up to 3).
    Matplotlib-table maps (:data:`COLORMAP_MPL`): sampled from matplotlib
    (bit-identical to cv2 for the viridis family + turbo; twilight ±2)."""
    t = np.arange(256, dtype=np.float64) / 255.0
    if name in COLORMAP_MPL:
        try:
            from matplotlib import colormaps as _mpl_maps
        except Exception as e:  # pragma: no cover
            raise ValueError(
                f"colormap {name!r} needs matplotlib (not available)"
            ) from e
        out = np.asarray(_mpl_maps[name](t), np.float64)[:, :3]
    elif name == "jet":
        anchors = COLORMAP_ANCHORS[name]
        xs = np.array([a[0] for a in anchors], np.float64)
        rgb = np.array([a[1] for a in anchors], np.float64)
        out = np.stack([np.interp(t, xs, rgb[:, c]) for c in range(3)],
                       axis=1)
    elif name in COLORMAP_ANCHORS:
        v64 = _colormap_rgb64(name)
        pos = t * 63.0
        j = np.minimum(pos.astype(np.int64), 62)
        f = (pos - j)[:, None]
        out = v64[j] * (1 - f) + v64[j + 1] * f
    else:
        have = sorted(k for k in COLORMAP_ANCHORS) + sorted(COLORMAP_MPL)
        raise ValueError(f"unknown colormap {name!r} (have {have})")
    u8 = np.floor(out * 255.0 + 0.5).astype(np.uint8)
    return u8[:, ::-1].copy()  # RGB -> BGR table


def normalize_u8(img: np.ndarray, alpha: float = 0.0, beta: float = 255.0,
                 kind: str = "minmax") -> np.ndarray:
    """Frozen u8 normalize (OpenCV ``normalize`` role): ``minmax`` maps
    [min, max] → [alpha, beta] (flat image → alpha); ``inf``/``l1``/``l2``
    scale so the chosen norm equals ``alpha``. float64 math, round
    half-away, saturate to u8. Device twin is f32 — documented ±1 LSB."""
    a = img.astype(np.float64)
    if kind == "minmax":
        lo, hi = float(a.min()), float(a.max())
        scale = 0.0 if hi == lo else (beta - alpha) / (hi - lo)
        out = (a - lo) * scale + alpha
    elif kind in ("inf", "l1", "l2"):
        n = {
            "inf": np.abs(a).max(),
            "l1": np.abs(a).sum(),
            "l2": np.sqrt((a * a).sum()),
        }[kind]
        out = a * (0.0 if n == 0 else alpha / n)
    else:
        raise ValueError(f"unknown norm kind {kind!r}")
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# MOSSE correlation-filter tracker (frozen float64 spec)
# ---------------------------------------------------------------------------
# OpenCV ``legacy::TrackerMOSSE`` role (Bolme et al. 2010). The reference
# has no tracker; this is an OpenCV-parity addition like MOG2/Kalman.
# All arithmetic is float64 + numpy rfft2 — the device twin
# (ops/tracker.py) is f32 and is bounded against this spec.

MOSSE_EPS = 1e-5
MOSSE_SIGMA = 2.0
#: Fixed init perturbations (angle_rad, scale) about the patch centre —
#: deterministic stand-ins for OpenCV's 8 random warps.
MOSSE_WARPS = (
    (0.0, 1.0), (0.05, 1.0), (-0.05, 1.0), (0.10, 1.0),
    (-0.10, 1.0), (0.18, 1.0), (0.0, 0.95), (0.0, 1.05),
)


def mosse_hann(h: int, w: int) -> np.ndarray:
    """Outer product of 1-D Hann windows (0.5 − 0.5·cos(2πk/(n−1));
    all-ones when an axis has a single sample)."""
    def hann1(n):
        if n == 1:
            return np.ones(1)
        k = np.arange(n, dtype=np.float64)
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1))
    return np.outer(hann1(h), hann1(w))


def mosse_preprocess(patch: np.ndarray) -> np.ndarray:
    """log(1+p), zero-mean / unit-std normalize (ε=1e-5), Hann-windowed."""
    p = np.log1p(patch.astype(np.float64))
    p = (p - p.mean()) / (p.std() + MOSSE_EPS)
    return p * mosse_hann(*p.shape)


def mosse_gauss(h: int, w: int, sigma: float = MOSSE_SIGMA) -> np.ndarray:
    """Desired response: unit-peak Gaussian at (h//2, w//2)."""
    ys, xs = np.mgrid[0:h, 0:w]
    d2 = (ys - h // 2) ** 2.0 + (xs - w // 2) ** 2.0
    return np.exp(-d2 / (2.0 * sigma * sigma))


def _mosse_warp_patch(patch: np.ndarray, angle: float, scale: float) -> np.ndarray:
    """Rotate+scale the patch about its centre, clamped bilinear sampling
    (replicate border)."""
    h, w = patch.shape
    c, s = np.cos(angle) / scale, np.sin(angle) / scale
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    sx = c * (xs - cx) + s * (ys - cy) + cx
    sy = -s * (xs - cx) + c * (ys - cy) + cy
    x0 = np.clip(np.floor(sx), 0, w - 1).astype(np.int64)
    y0 = np.clip(np.floor(sy), 0, h - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    p = patch.astype(np.float64)
    top = p[y0, x0] * (1 - fx) + p[y0, x1] * fx
    bot = p[y1, x0] * (1 - fx) + p[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def _mosse_crop(frame: np.ndarray, cy: int, cx: int, h: int, w: int):
    """Clamped h×w crop centred at (cy, cx); returns (patch, oy, ox)."""
    fh, fw = frame.shape
    oy = int(np.clip(cy - h // 2, 0, fh - h))
    ox = int(np.clip(cx - w // 2, 0, fw - w))
    return frame[oy:oy + h, ox:ox + w], oy, ox


def mosse_init(frame: np.ndarray, bbox):
    """Train the filter on the bbox patch over :data:`MOSSE_WARPS`.
    ``bbox`` = (x, y, w, h) ints. Returns state dict with complex A/B
    numerator/denominator spectra (rfft2 half-plane), the desired-response
    spectrum G, integer centre (cy, cx) and window (h, w)."""
    x, y, w, h = (int(v) for v in bbox)
    if h < 4 or w < 4:
        raise ValueError("MOSSE window must be at least 4x4")
    cy, cx = y + h // 2, x + w // 2
    patch, _, _ = _mosse_crop(np.asarray(frame, np.float64), cy, cx, h, w)
    G = np.fft.rfft2(mosse_gauss(h, w))
    A = np.zeros_like(G)
    B = np.zeros(G.shape, np.float64)
    for ang, sc in MOSSE_WARPS:
        F = np.fft.rfft2(mosse_preprocess(_mosse_warp_patch(patch, ang, sc)))
        A += G * np.conj(F)
        B += (F * np.conj(F)).real
    return {"A": A, "B": B, "G": G, "center": (cy, cx), "size": (h, w)}


def mosse_psr(resp: np.ndarray, py: int, px: int, excl: int = 5) -> float:
    """Peak-to-sidelobe ratio: peak vs mean/std outside the (2·excl+1)²
    exclusion square around the peak."""
    h, w = resp.shape
    mask = np.ones((h, w), bool)
    mask[max(py - excl, 0):py + excl + 1, max(px - excl, 0):px + excl + 1] = False
    side = resp[mask]
    return float((resp[py, px] - side.mean()) / (side.std() + MOSSE_EPS))


def mosse_step(state: dict, frame: np.ndarray, lr: float = 0.2,
               psr_threshold: float = 5.7):
    """One tracking step: correlate at the last centre, move to the
    response peak, compute PSR; when PSR clears the threshold, re-crop at
    the new centre and blend the filter with rate ``lr``. Returns
    (new_state, ok, psr). On failure the state (incl. centre) is frozen —
    OpenCV's legacy tracker likewise reports failure and stops adapting."""
    h, w = state["size"]
    cy, cx = state["center"]
    f64 = np.asarray(frame, np.float64)
    patch, oy, ox = _mosse_crop(f64, cy, cx, h, w)
    F = np.fft.rfft2(mosse_preprocess(patch))
    resp = np.fft.irfft2(F * state["A"] / (state["B"] + MOSSE_EPS), s=(h, w))
    py, px = np.unravel_index(int(resp.argmax()), resp.shape)
    psr = mosse_psr(resp, int(py), int(px))
    if psr < psr_threshold:
        return state, False, psr
    # displacement of the peak from the response origin (h//2, w//2),
    # re-anchored to the actual (clamped) crop origin
    ncy = oy + h // 2 + (int(py) - h // 2)
    ncx = ox + w // 2 + (int(px) - w // 2)
    fh, fw = f64.shape
    ncy = int(np.clip(ncy, h // 2, fh - h + h // 2))
    ncx = int(np.clip(ncx, w // 2, fw - w + w // 2))
    patch2, _, _ = _mosse_crop(f64, ncy, ncx, h, w)
    F2 = np.fft.rfft2(mosse_preprocess(patch2))
    A = lr * (state["G"] * np.conj(F2)) + (1.0 - lr) * state["A"]
    B = lr * (F2 * np.conj(F2)).real + (1.0 - lr) * state["B"]
    new = {"A": A, "B": B, "G": state["G"], "center": (ncy, ncx),
           "size": (h, w)}
    return new, True, psr

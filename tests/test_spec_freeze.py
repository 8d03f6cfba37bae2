"""Spec-freeze regression goldens.

The fidelity contract says every frozen spec (pattern, encoders, decode
arithmetic, filters, resize, drawing) is pixel-exact and immutable. These
SHA256 fingerprints of canonical outputs pin the specs: any change to the
arithmetic — intentional or accidental — fails here first and must be a
conscious, documented decision (a new spec version, not a silent drift).
"""

import hashlib

import numpy as np

from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.core import PixelFormat
from rustcv_tpu.ops import golden

W, H, SEQ = 64, 48, 7

GOLDEN_HASHES = {
    "pattern": "0366b631d2129aa9",
    "raw_YUYV": "08f70a9dbed4b6c4",
    "raw_UYVY": "fc46409eb2041540",
    "raw_NV12": "6dfaebeaf54a3224",
    "raw_YV12": "dd9b0b0fd1959dc1",
    "raw_BGRA32": "fee1ec5a9168908d",
    "raw_RGB24": "2bd578fa2bf8210b",
    "raw_BAYER_RGGB": "fd1f5cb3ea4af7a6",
    "raw_GRAY8": "f3c10c32f724fec0",
    "decoded": "4fec4ed5e3538f8f",
    "gray": "ea145f413e3f87f9",
    "gauss": "8dda84a5b028414b",
    "blur_sobel": "9e8117480976397e",
    "resize": "27414bd11dfa1ec4",
    "resize_nearest": "b9e99ffc81081283",
    "resize_area": "f2000f06b1182189",  # 4×4 box (2×2 ≡ bilinear exactly)
    "hsv": "ac8fd9552515f909",
    "clahe": "90c50b9788c56603",
    "bilateral": "f399e308439818ce",
    "adaptive": "a4f3f364fa9ad4b2",
    "line_mask": "340072616ca353d3",
    "circle_mask": "0e55d581dae9145a",
    "pyr_down": "547dddceb3c29b48",
    "rect": "56b8ed603693fdf8",
    "demosaic": "bb79f11a3e96c6fa",
    # round-3 additions
    "ycrcb": "815774196f9c1ddc",
    "ycrcb_back": "a735db09f3c7d3a4",
    "hsv_back": "5936c3b12398026f",
    "bicubic": "22ea78b64a5275bc",
}
HARRIS_CORNER_COUNT = 10
# Fixed-point Harris response (int32) — frozen spec (golden.harris_response_i32)
HARRIS_I32_HASH = "78ea761e2457e90e"


def _h(a: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def test_pattern_and_encoders_frozen():
    assert _h(sim.synth_bgr(W, H, SEQ)) == GOLDEN_HASHES["pattern"]
    for fmt in (
        PixelFormat.YUYV, PixelFormat.UYVY, PixelFormat.NV12, PixelFormat.YV12,
        PixelFormat.BGRA32, PixelFormat.RGB24, PixelFormat.BAYER_RGGB,
        PixelFormat.GRAY8,
    ):
        assert _h(sim.synth_raw(W, H, fmt, SEQ)) == GOLDEN_HASHES[f"raw_{fmt.value}"], fmt


def test_decode_and_ops_frozen():
    yuyv = sim.synth_raw(W, H, PixelFormat.YUYV, SEQ)
    dec = golden.yuyv_to_bgr(yuyv, W, H)
    assert _h(dec) == GOLDEN_HASHES["decoded"]
    assert _h(golden.bgr_to_gray(dec)) == GOLDEN_HASHES["gray"]
    assert _h(golden.gaussian5_u8(dec)) == GOLDEN_HASHES["gauss"]
    assert _h(golden.blur_sobel_mag_u8(dec)) == GOLDEN_HASHES["blur_sobel"]
    assert _h(golden.resize_bilinear(dec, 32, 24)) == GOLDEN_HASHES["resize"]
    assert _h(golden.resize_nearest(dec, 32, 24)) == GOLDEN_HASHES["resize_nearest"]
    assert _h(golden.resize_area(dec, 16, 12)) == GOLDEN_HASHES["resize_area"]
    assert _h(golden.bgr_to_hsv(dec)) == GOLDEN_HASHES["hsv"]
    from rustcv_tpu.ops import hist as _hist

    gray = golden.bgr_to_gray(dec)
    assert _h(_hist.clahe_numpy(gray, 40, (4, 4))) == GOLDEN_HASHES["clahe"]
    assert _h(golden.bilateral5_u8(gray, 25)) == GOLDEN_HASHES["bilateral"]
    assert _h(golden.adaptive_threshold(gray)) == GOLDEN_HASHES["adaptive"]
    assert _h(golden.line_mask(H, W, (5, 5), (58, 40), 3)) == GOLDEN_HASHES["line_mask"]
    assert _h(golden.circle_mask(H, W, (32, 24), 15, 2)) == GOLDEN_HASHES["circle_mask"]
    assert _h(golden.pyr_down(dec)) == GOLDEN_HASHES["pyr_down"]
    ov = dec.copy()
    golden.rectangle(ov.reshape(H, -1), H, W, W * 3, (5, 5, 30, 20), (9, 99, 199), 2)
    assert _h(ov) == GOLDEN_HASHES["rect"]
    raw_bayer = sim.synth_raw(W, H, PixelFormat.BAYER_RGGB, SEQ).reshape(H, W)
    assert _h(golden.demosaic_bilinear(raw_bayer, "RGGB")) == GOLDEN_HASHES["demosaic"]
    ycc = golden.bgr_to_ycrcb(dec)
    assert _h(ycc) == GOLDEN_HASHES["ycrcb"]
    assert _h(golden.ycrcb_to_bgr(ycc)) == GOLDEN_HASHES["ycrcb_back"]
    assert _h(golden.hsv_to_bgr(golden.bgr_to_hsv(dec))) == GOLDEN_HASHES["hsv_back"]
    assert _h(golden.resize_bicubic(dec, 40, 30)) == GOLDEN_HASHES["bicubic"]


def test_harris_corner_count_frozen():
    yuyv = sim.synth_raw(W, H, PixelFormat.YUYV, SEQ)
    gray = golden.bgr_to_gray(golden.yuyv_to_bgr(yuyv, W, H))
    assert int(golden.harris_corners(gray).sum()) == HARRIS_CORNER_COUNT
    resp = golden.harris_response_i32(gray)
    assert resp.dtype == np.int32
    assert _h(resp) == HARRIS_I32_HASH


def test_put_text_masks_frozen():
    """put_text is part of the frozen spec: the font is VENDORED
    (rustcv_tpu/assets/DejaVuSans.ttf, matching the reference's
    include_bytes! discipline at drawing.rs:115), so glyph masks must be
    byte-identical on every host."""
    from rustcv_tpu.ops import text as _text

    cases = {
        ("FPS: 42.0", 1.0): ("ee52d0a2ba9dbb36", (24, 128), 0, -19),
        ("Hello, RustCV!", 0.75): ("56b219d91ce6f70f", (18, 128), 0, -14),
        ("XyZ 089", 2.0): ("d4ad8f4689ecea68", (48, 256), 0, -38),
    }
    for (s, scale), (want, shape, dx, dy) in cases.items():
        mask, gdx, gdy = _text.rasterize(s, scale)
        assert (_h(mask), mask.shape, gdx, gdy) == (want, shape, dx, dy), (s, scale)


def test_font_is_vendored():
    import os

    from rustcv_tpu.ops.text import _VENDORED_FONT

    assert os.path.exists(_VENDORED_FONT)
    assert os.path.exists(_VENDORED_FONT.replace(".ttf", ".LICENSE"))

"""EAN-13: encode/decode round trip, noise/scale robustness, and
cross-decode interop with cv2.barcode_BarcodeDetector."""

import numpy as np
import pytest

from rustcv_tpu.ops import barcode as bc

cv2 = pytest.importorskip("cv2")


def test_checksum():
    # well-known example: 590123412345 → check 7
    assert bc.ean13_checksum("590123412345") == 7


def test_round_trip():
    for code in ("590123412345", "400638133393", "012345678905"):
        bits = bc.encode_ean13(code)
        assert bits.shape == (95,) and bits[0] == 1 and bits[-1] == 1
        img = bc.draw_barcode(bits, module_px=3)
        out = bc.detect_and_decode(img)
        expected = code + str(bc.ean13_checksum(code))
        assert out and out[0] == expected


def test_robust_to_noise_scale_and_flip(rng):
    code = "731234567890"
    expected = code + str(bc.ean13_checksum(code))
    bits = bc.encode_ean13(code)
    img = bc.draw_barcode(bits, module_px=4, height=50)
    noisy = np.clip(img.astype(float)
                    + rng.normal(0, 18, img.shape), 0, 255).astype(
                        np.uint8)
    assert bc.detect_and_decode(noisy)[0] == expected
    # mirrored scan (barcode upside down)
    assert bc.detect_and_decode(img[:, ::-1])[0] == expected
    # vertical orientation (rows become columns)
    assert bc.detect_and_decode(img.T)[0] == expected


def test_cv2_decodes_ours():
    code = "590123412345"
    bits = bc.encode_ean13(code)
    img = bc.draw_barcode(bits, module_px=4, height=80, quiet=12)
    det = cv2.barcode_BarcodeDetector()
    ok, info, _, _ = det.detectAndDecodeMulti(img)
    if not ok or not any(info):
        pytest.skip("cv2 detector found nothing on the synthetic strip")
    assert code + str(bc.ean13_checksum(code)) in list(info)


def test_we_decode_cv2_style_render(rng):
    # arbitrary digits, rendered at a non-integer-ish module width via
    # resize — the run normalization must cope
    code = "401234567894"
    img = bc.draw_barcode(bc.encode_ean13(code), module_px=3)
    big = cv2.resize(img, (int(img.shape[1] * 1.7), 40),
                     interpolation=cv2.INTER_LINEAR)
    out = bc.detect_and_decode(big)
    assert out and out[0] == code + str(bc.ean13_checksum(code))


def test_rejects_non_barcode(rng):
    img = rng.integers(0, 256, (60, 200), np.uint8)
    assert bc.detect_and_decode(img) == []

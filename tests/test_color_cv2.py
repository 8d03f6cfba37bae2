"""Differential tests for the extended cvtColor families (r5).

Each case runs the same call through rustcv_tpu.cv2 and the installed
OpenCV 5.0 on randomized u8 inputs.  Exactness class per family is the
one documented in ops/color_cv2.py: `exact` asserts bit-equality,
`lsb(n, rate)` asserts |diff| <= n and a bounded mismatch rate.
"""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")

from tests._seeds import diff_seeds

SEEDS = diff_seeds(3)


def _img(seed, h=32, w=40, c=3):
    r = np.random.RandomState(seed)
    return r.randint(0, 256, (h, w, c) if c else (h, w), np.uint8)


def _run(code, src):
    got = np.asarray(R.cvtColor(src, code))
    want = cv2.cvtColor(src, code)
    return got, want


def _exact(code, src):
    got, want = _run(code, src)
    np.testing.assert_array_equal(got, want, err_msg=str(code))


def _lsb(code, src, n, rate):
    got, want = _run(code, src)
    assert got.shape == want.shape, code
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert d.max() <= n, (code, d.max())
    assert (d > 0).mean() <= rate, (code, (d > 0).mean())


EXACT_3CH = [
    "COLOR_BGR2RGBA", "COLOR_RGB2BGRA",
    "COLOR_BGR2BGR565", "COLOR_RGB2BGR565",
    "COLOR_BGR2BGR555", "COLOR_RGB2BGR555",
    "COLOR_BGR2XYZ", "COLOR_RGB2XYZ",
    "COLOR_XYZ2BGR", "COLOR_XYZ2RGB",
    "COLOR_BGR2YUV", "COLOR_RGB2YUV",
    "COLOR_YUV2BGR", "COLOR_YUV2RGB",
    "COLOR_BGR2HSV_FULL", "COLOR_RGB2HSV_FULL",
    "COLOR_HSV2BGR_FULL", "COLOR_HSV2RGB_FULL",
    "COLOR_HLS2BGR", "COLOR_HLS2RGB",
    "COLOR_LBGR2Lab", "COLOR_LRGB2Lab",
    "COLOR_BGR2YUV_I420", "COLOR_RGB2YUV_I420",
    "COLOR_BGR2YUV_YV12", "COLOR_RGB2YUV_YV12",
]


@pytest.mark.parametrize("name", EXACT_3CH)
@pytest.mark.parametrize("seed", SEEDS)
def test_exact_3ch(name, seed):
    _exact(getattr(cv2, name), _img(seed))


LSB_3CH = [
    # (name, max LSB, max mismatch rate) — rates documented in
    # ops/color_cv2.py; bounds here have ~2x headroom over measured
    ("COLOR_BGR2HLS", 1, 0.005),
    ("COLOR_RGB2HLS", 1, 0.005),
    ("COLOR_BGR2HLS_FULL", 1, 0.12),
    ("COLOR_RGB2HLS_FULL", 1, 0.12),
    ("COLOR_HLS2BGR_FULL", 2, 0.10),
    ("COLOR_HLS2RGB_FULL", 2, 0.10),
    ("COLOR_BGR2Luv", 1, 0.30),
    ("COLOR_RGB2Luv", 1, 0.30),
    ("COLOR_LBGR2Luv", 2, 0.40),
    ("COLOR_BGR2YUV_YUY2", 1, 0.02),
    ("COLOR_BGR2YUV_UYVY", 1, 0.02),
    ("COLOR_BGR2YUV_YVYU", 1, 0.02),
    ("COLOR_RGB2YUV_YUY2", 1, 0.02),
]


@pytest.mark.parametrize("name,n,rate", LSB_3CH)
@pytest.mark.parametrize("seed", SEEDS)
def test_lsb_3ch(name, n, rate, seed):
    _lsb(getattr(cv2, name), _img(seed), n, rate)


@pytest.mark.parametrize("name,back", [
    ("COLOR_Luv2BGR", "COLOR_BGR2Luv"),
    ("COLOR_Luv2RGB", "COLOR_RGB2Luv"),
    ("COLOR_Luv2LBGR", "COLOR_LBGR2Luv"),
])
@pytest.mark.parametrize("seed", SEEDS)
def test_luv_inverse_in_gamut(name, back, seed):
    """The inverse is only meaningful on in-gamut Luv triples (random
    u8 triples are mostly out of gamut, where cv2's LUT saturates along
    a different path).  Envelope re-measured over 300 seeds when r5 seed
    rotation caught a ±5 sample (the original ±4 was a 5-seed estimate):
    L>2 pixels are ±5 with >4 on <0.1% of pixels; near-black pixels
    (u8 L<=2) are numerically unstable BY CONSTRUCTION — the Luv->XYZ
    inverse divides by ~L, so one quantization LSB of u/v swings the
    chroma arbitrarily (worst observed 76) and cv2's own LUT path picks
    a different saturation. Bounded loosely, excluded from the strict
    check."""
    luv = cv2.cvtColor(_img(seed), getattr(cv2, back))
    got = np.asarray(R.cvtColor(luv, getattr(cv2, name)))
    want = cv2.cvtColor(luv, getattr(cv2, name))
    d = np.abs(got.astype(np.int64) - want.astype(np.int64))
    stable = luv[..., 0] > 2
    if stable.any():
        ds = d[stable]
        assert ds.max() <= 5, ds.max()
        assert (ds > 4).mean() <= 2e-3, (ds > 4).mean()
    if (~stable).any():
        assert d[~stable].max() <= 128, d[~stable].max()


EXACT_4CH = [
    "COLOR_BGRA2RGB", "COLOR_RGBA2BGR", "COLOR_BGRA2RGBA",
    "COLOR_BGRA2BGR565", "COLOR_BGRA2BGR555",
    "COLOR_BGRA2YUV_I420", "COLOR_RGBA2YUV_YV12",
]


@pytest.mark.parametrize("name", EXACT_4CH)
@pytest.mark.parametrize("seed", SEEDS[:2])
def test_exact_4ch(name, seed):
    _exact(getattr(cv2, name), _img(seed, c=4))


EXACT_PACKED16 = [
    "COLOR_BGR5652BGR", "COLOR_BGR5652RGB",
    "COLOR_BGR5652BGRA", "COLOR_BGR5652RGBA", "COLOR_BGR5652GRAY",
    "COLOR_BGR5552BGR", "COLOR_BGR5552RGB",
    "COLOR_BGR5552BGRA", "COLOR_BGR5552RGBA", "COLOR_BGR5552GRAY",
]


@pytest.mark.parametrize("name", EXACT_PACKED16)
@pytest.mark.parametrize("seed", SEEDS[:2])
def test_exact_packed16(name, seed):
    _exact(getattr(cv2, name), _img(seed, c=2))


@pytest.mark.parametrize("name", ["COLOR_GRAY2BGR565", "COLOR_GRAY2BGR555"])
def test_exact_from_gray(name):
    _exact(getattr(cv2, name), _img(3, c=0))


EXACT_420_READ = [
    "COLOR_YUV2BGR_NV12", "COLOR_YUV2RGB_NV12",
    "COLOR_YUV2BGRA_NV12", "COLOR_YUV2RGBA_NV21",
    "COLOR_YUV2BGR_NV21", "COLOR_YUV2RGB_NV21",
    "COLOR_YUV2BGR_I420", "COLOR_YUV2RGB_I420",
    "COLOR_YUV2BGRA_I420",
    "COLOR_YUV2BGR_YV12", "COLOR_YUV2RGB_YV12",
    "COLOR_YUV2GRAY_420",
]


@pytest.mark.parametrize("name", EXACT_420_READ)
@pytest.mark.parametrize("seed", SEEDS[:2])
def test_exact_420_read(name, seed):
    buf = _img(seed, h=24, w=20, c=0)   # (H*3/2, W) for H=16
    _exact(getattr(cv2, name), buf)


EXACT_422_READ = [
    "COLOR_YUV2BGR_YUY2", "COLOR_YUV2RGB_YUY2", "COLOR_YUV2BGRA_YUY2",
    "COLOR_YUV2BGR_YVYU", "COLOR_YUV2RGB_YVYU",
    "COLOR_YUV2BGR_UYVY", "COLOR_YUV2RGB_UYVY", "COLOR_YUV2RGBA_UYVY",
    "COLOR_YUV2GRAY_YUY2", "COLOR_YUV2GRAY_UYVY",
]


@pytest.mark.parametrize("name", EXACT_422_READ)
@pytest.mark.parametrize("seed", SEEDS[:2])
def test_exact_422_read(name, seed):
    _exact(getattr(cv2, name), _img(seed, c=2))


def test_cvt_two_plane_exact():
    for seed in SEEDS:
        r = np.random.RandomState(seed)
        y = r.randint(0, 256, (16, 20), np.uint8)
        uv = r.randint(0, 256, (8, 10, 2), np.uint8)
        for name in ("COLOR_YUV2BGR_NV12", "COLOR_YUV2RGB_NV12",
                     "COLOR_YUV2BGR_NV21", "COLOR_YUV2RGB_NV21"):
            code = getattr(cv2, name)
            got = np.asarray(R.cvtColorTwoPlane(y, uv, code))
            want = cv2.cvtColorTwoPlane(y, uv, code)
            np.testing.assert_array_equal(got, want, err_msg=name)


@pytest.mark.parametrize("name", [
    "COLOR_BayerBG2BGR", "COLOR_BayerGB2BGR",
    "COLOR_BayerRG2BGR", "COLOR_BayerGR2BGR",
])
def test_bayer_via_cvtcolor(name):
    """Bayer routes through the frozen-spec bilinear demosaic: interior
    ±1 LSB of cv2 (documented reflect-101 borders differ)."""
    raw = _img(2, c=0)
    got = np.asarray(R.cvtColor(raw, getattr(cv2, name)))
    want = cv2.cvtColor(raw, getattr(cv2, name))
    d = np.abs(got[2:-2, 2:-2].astype(int) - want[2:-2, 2:-2].astype(int))
    assert d.max() <= 1, d.max()


def test_roundtrip_565():
    img = _img(5)
    packed = np.asarray(R.cvtColor(img, cv2.COLOR_BGR2BGR565))
    back = np.asarray(R.cvtColor(packed, cv2.COLOR_BGR5652BGR))
    wb = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_BGR2BGR565),
                      cv2.COLOR_BGR5652BGR)
    np.testing.assert_array_equal(back, wb)

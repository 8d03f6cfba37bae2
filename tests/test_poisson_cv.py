"""Differential tests: cv2-exact photo module (Poisson editing + Canny).

Validates ops/poisson_cv.py and ops/canny_cv.py against real OpenCV 5.0
(the r4 advisor findings: poisson_cv was unwired/untested, MIXED_CLONE
selection rule deviated, ROI gradient semantics deviated,
texture_flattening was a stub).  Canny is asserted bit-exact; the
Poisson solves go through two f64 FFT DST passes so we assert a small
LSB envelope on u8 output.
"""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R
from rustcv_tpu.ops.canny_cv import canny_cv
from rustcv_tpu.ops import poisson_cv as P

cv2 = pytest.importorskip("cv2")

from tests._seeds import diff_seeds

SEEDS = diff_seeds(5)


def _smooth_u8(rng, h, w, c=3):
    """Low-frequency random image (Poisson editing inputs are natural
    images; pure noise makes the LSB envelope meaninglessly loose)."""
    small = rng.rand(max(2, h // 8), max(2, w // 8), c) * 255
    img = cv2.resize(small.astype(np.float32), (w, h),
                     interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.uint8)


def _blob_mask(rng, h, w):
    m = np.zeros((h, w), np.uint8)
    cy, cx = int(h * (0.35 + 0.3 * rng.rand())), int(w * (0.35 + 0.3 * rng.rand()))
    ry, rx = int(h * 0.2) + 2, int(w * 0.2) + 2
    yy, xx = np.mgrid[0:h, 0:w]
    m[((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0] = 255
    return m


def _lsb(a, b, n, frac=1.0):
    d = np.abs(np.asarray(a, np.int64) - np.asarray(b, np.int64))
    assert d.max() <= n, f"max LSB {d.max()} > {n}"
    if frac < 1.0:
        assert (d > 0).mean() <= frac, (d > 0).mean()


# --------------------------------------------------------------- Canny

@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("aperture,l2", [(3, False), (3, True),
                                         (5, False), (7, False)])
def test_canny_exact_gray(seed, aperture, l2):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (48, 64), np.uint8)
    lo, hi = {3: (40, 120), 5: (200, 600), 7: (1000, 4000)}[aperture]
    got = canny_cv(img, lo, hi, aperture, l2)
    want = cv2.Canny(img, lo, hi, apertureSize=aperture, L2gradient=l2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_canny_exact_bgr(seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (32, 40, 3), np.uint8)
    got = canny_cv(img, 60, 180)
    want = cv2.Canny(img, 60, 180)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_canny_facade_matches_cv2(seed):
    rng = np.random.RandomState(seed)
    img = cv2.cvtColor(_smooth_u8(rng, 40, 56), cv2.COLOR_BGR2GRAY)
    got = R.Canny(img, 50, 150)
    want = cv2.Canny(img, 50, 150)
    np.testing.assert_array_equal(np.asarray(got), want)


# ------------------------------------------------------- seamlessClone

@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("flags", [1, 2, 3])
def test_seamless_clone(seed, flags):
    rng = np.random.RandomState(seed)
    src = _smooth_u8(rng, 40, 48)
    dst = _smooth_u8(rng, 64, 80)
    mask = _blob_mask(rng, 40, 48)
    p = (40, 32)
    got = R.seamlessClone(src, dst, mask, p, flags)
    want = cv2.seamlessClone(src, dst, mask.copy(), p, flags)
    _lsb(got, want, 1, frac=0.02)


def test_seamless_clone_out_of_bounds_raises():
    src = np.zeros((20, 20, 3), np.uint8)
    dst = np.zeros((30, 30, 3), np.uint8)
    mask = np.full((20, 20), 255, np.uint8)
    with pytest.raises(Exception):
        R.seamlessClone(src, dst, mask, (2, 2), 1)


# ------------------------------------------- full-image photo variants

@pytest.mark.parametrize("seed", SEEDS)
def test_color_change(seed):
    rng = np.random.RandomState(seed)
    src = _smooth_u8(rng, 40, 48)
    mask = _blob_mask(rng, 40, 48)
    got = R.colorChange(src, mask, red_mul=1.5, green_mul=0.7,
                        blue_mul=1.1)
    want = cv2.colorChange(src, mask.copy(), red_mul=1.5,
                           green_mul=0.7, blue_mul=1.1)
    _lsb(got, want, 1, frac=0.02)


@pytest.mark.parametrize("seed", SEEDS)
def test_illumination_change(seed):
    rng = np.random.RandomState(seed)
    src = _smooth_u8(rng, 40, 48)
    mask = _blob_mask(rng, 40, 48)
    got = R.illuminationChange(src, mask, alpha=0.2, beta=0.4)
    want = cv2.illuminationChange(src, mask.copy(), alpha=0.2, beta=0.4)
    _lsb(got, want, 1, frac=0.02)


@pytest.mark.parametrize("seed", SEEDS)
def test_texture_flattening(seed):
    rng = np.random.RandomState(seed)
    src = _smooth_u8(rng, 40, 48)
    mask = _blob_mask(rng, 40, 48)
    got = R.textureFlattening(src, mask, low_threshold=30,
                              high_threshold=45, kernel_size=3)
    want = cv2.textureFlattening(src, mask.copy(), low_threshold=30,
                                 high_threshold=45, kernel_size=3)
    _lsb(got, want, 1, frac=0.02)


# ----------------------------------------------------- HDR param plumb

def test_align_mtb_exclude_range_plumbed():
    rng = np.random.RandomState(3)
    base = _smooth_u8(rng, 48, 64)
    imgs = [base,
            np.roll(np.clip(base.astype(np.int32) * 2, 0, 255)
                    .astype(np.uint8), (2, -3), (0, 1))]
    for er in (1, 4):
        a = R.createAlignMTB(max_bits=5, exclude_range=er)
        w = cv2.createAlignMTB(max_bits=5, exclude_range=er)
        got = a.calculateShift(cv2.cvtColor(imgs[0], cv2.COLOR_BGR2GRAY),
                               cv2.cvtColor(imgs[1], cv2.COLOR_BGR2GRAY))
        want = w.calculateShift(cv2.cvtColor(imgs[0], cv2.COLOR_BGR2GRAY),
                                cv2.cvtColor(imgs[1], cv2.COLOR_BGR2GRAY))
        assert tuple(got) == tuple(want), (er, got, want)


def test_align_mtb_compute_bitmaps_outputs():
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (32, 40), np.uint8)
    a = R.createAlignMTB()
    w = cv2.createAlignMTB()
    tb = np.zeros_like(g)
    eb = np.zeros_like(g)
    t1, e1 = a.computeBitmaps(g, tb, eb)
    t2, e2 = w.computeBitmaps(g)
    np.testing.assert_array_equal(np.asarray(t1), t2)
    np.testing.assert_array_equal(np.asarray(e1), e2)
    np.testing.assert_array_equal(tb, t2)  # output args written
    np.testing.assert_array_equal(eb, e2)


def test_align_mtb_calculate_shift_exact_sweep():
    """Bit-exact vs cv2.AlignMTB.calculateShift on textured pairs with
    exposure scaling (the regime where the pyramid/median/scan-order
    details all matter)."""
    a_us = R.createAlignMTB()
    a_cv = cv2.createAlignMTB()
    for s in range(8):
        r = np.random.RandomState(s)
        base = (r.randint(0, 2, (30, 40)).repeat(16, 0).repeat(16, 1)
                * 160 + r.randint(0, 80, (480, 640))).astype(np.uint8)
        sy, sx = r.randint(-6, 7), r.randint(-6, 7)
        shifted = np.zeros_like(base)
        ys = slice(max(sy, 0), 480 + min(sy, 0))
        xs = slice(max(sx, 0), 640 + min(sx, 0))
        shifted[ys, xs] = np.clip(
            base.astype(np.float32) * 1.4, 0, 255).astype(np.uint8)[
            slice(max(-sy, 0), 480 + min(-sy, 0)),
            slice(max(-sx, 0), 640 + min(-sx, 0))]
        got = tuple(a_us.calculateShift(base, shifted))
        want = tuple(a_cv.calculateShift(base, shifted))
        assert got == want, (s, got, want)


def test_align_mtb_shiftmat_direction():
    a_us = R.createAlignMTB()
    a_cv = cv2.createAlignMTB()
    src = np.zeros((8, 8), np.uint8)
    src[2, 3] = 255
    got = np.asarray(a_us.shiftMat(src, (1, 2)))
    want = np.asarray(a_cv.shiftMat(src, (1, 2)))
    np.testing.assert_array_equal(got, want)


def test_align_mtb_process_pivot_is_middle():
    rng = np.random.RandomState(2)
    g = (rng.randint(0, 2, (30, 40)).repeat(16, 0).repeat(16, 1) * 160
         + rng.randint(0, 80, (480, 640))).astype(np.uint8)
    base = np.stack([g, g, g], -1)

    def sh(x, dy, dx):
        out = np.zeros_like(x)
        out[max(dy, 0):480 + min(dy, 0), max(dx, 0):640 + min(dx, 0)] = \
            x[max(-dy, 0):480 + min(-dy, 0), max(-dx, 0):640 + min(-dx, 0)]
        return out

    stack = [sh(base, 2, 3), base.copy(), sh(base, -1, -2)]
    out = R.createAlignMTB().process([s.copy() for s in stack], None)
    out = [np.asarray(o) for o in out]
    # pivot (middle) unchanged
    np.testing.assert_array_equal(out[1], base)
    # outer images shifted exactly as cv2 shifts them (cv2's pivot slot
    # is left unwritten by its binding when dst arrays are supplied —
    # compare the non-pivot outputs only)
    want = [np.zeros_like(base) for _ in stack]
    cv2.createAlignMTB().process([s.copy() for s in stack], want)
    np.testing.assert_array_equal(out[0], np.asarray(want[0]))
    np.testing.assert_array_equal(out[2], np.asarray(want[2]))


def test_calibrate_debevec_deterministic_grid():
    rng = np.random.RandomState(11)
    base = _smooth_u8(rng, 48, 64)
    times = np.array([1 / 60, 1 / 15, 1 / 4], np.float32)
    imgs = [np.clip(base.astype(np.float64) * t / times[0], 0,
                    255).astype(np.uint8) for t in times]
    got = R.createCalibrateDebevec().process(imgs, times)
    want = cv2.createCalibrateDebevec().process(imgs, times)
    g = np.log(np.asarray(got, np.float64) + 1e-12)
    w = np.log(np.asarray(want, np.float64) + 1e-12)
    # response curves agree up to EM/solver noise at the dark tail
    assert np.median(np.abs(g - w)) < 0.15

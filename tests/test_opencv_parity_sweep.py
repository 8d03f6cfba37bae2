"""Randomized multi-seed sweep of the bit-exact cv2 parity claims —
guards against rare-input divergences that a single fixture misses
(the equalizeHist ±1 CDF-tie case was found exactly this way)."""

import numpy as np
import pytest

from rustcv_tpu.ops import golden

cv2 = pytest.importorskip("cv2")

SEEDS = range(25)


def _gray(seed, shape=(48, 64)):
    return np.random.default_rng(seed).integers(0, 256, shape, np.uint8)


def _bgr(seed, shape=(48, 64, 3)):
    return np.random.default_rng(1000 + seed).integers(0, 256, shape,
                                                       np.uint8)


def test_sweep_bit_exact_gray_ops():
    k33 = np.ones((3, 3), np.uint8)
    for seed in SEEDS:
        g = _gray(seed)
        assert (np.asarray(golden.threshold(g, 127, 255))
                == cv2.threshold(g, 127, 255,
                                 cv2.THRESH_BINARY)[1]).all(), seed
        assert (np.asarray(golden.median3(g))[1:-1, 1:-1]
                == cv2.medianBlur(g, 3)[1:-1, 1:-1]).all(), seed
        assert (np.asarray(golden.erode(g))[1:-1, 1:-1]
                == cv2.erode(g, k33)[1:-1, 1:-1]).all(), seed
        assert (np.asarray(golden.gaussian5_u8(g))[2:-2, 2:-2]
                == cv2.GaussianBlur(g, (5, 5), 0)[2:-2, 2:-2]).all(), \
            seed
        gx = golden.sobel3_gray(g)
        gx = gx[0] if isinstance(gx, tuple) else gx
        assert (np.asarray(gx)[1:-1, 1:-1]
                == cv2.Sobel(g, cv2.CV_16S, 1, 0)[1:-1, 1:-1]).all(), \
            seed
        assert (golden.integral(g) == cv2.integral(g)).all(), seed
        assert (np.asarray(golden.pyr_down(g))[1:-1, 1:-1]
                == cv2.pyrDown(g)[1:-1, 1:-1]).all(), seed
        assert (np.asarray(
            golden.adaptive_threshold(g, 255, "mean", 11, 2))[5:-5, 5:-5]
            == cv2.adaptiveThreshold(
                g, 255, cv2.ADAPTIVE_THRESH_MEAN_C,
                cv2.THRESH_BINARY, 11, 2)[5:-5, 5:-5]).all(), seed


def test_sweep_color_and_resize():
    for seed in SEEDS:
        c = _bgr(seed)
        d = np.abs(np.asarray(golden.bgr_to_gray(c)).astype(int)
                   - cv2.cvtColor(c, cv2.COLOR_BGR2GRAY).astype(int))
        assert d.max() <= 1, seed
        d = np.abs(np.asarray(golden.bgr_to_hsv(c)).astype(int)
                   - cv2.cvtColor(c, cv2.COLOR_BGR2HSV).astype(int))
        assert d.max() <= 1, seed
        assert (np.asarray(golden.bgr_to_ycrcb(c))
                == cv2.cvtColor(c, cv2.COLOR_BGR2YCrCb)).all(), seed
        assert (np.asarray(golden.resize_bilinear(c, 32, 24))
                == cv2.resize(c, (32, 24))).all(), seed
        d = np.abs(np.asarray(golden.resize_bicubic(c, 80, 60))
                   .astype(int)
                   - cv2.resize(c, (80, 60),
                                interpolation=cv2.INTER_CUBIC)
                   .astype(int))
        assert d.max() <= 1, seed

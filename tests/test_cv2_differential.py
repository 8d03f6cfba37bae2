"""Differential sweep: facade vs real OpenCV 5.0 on randomized inputs.

Breadth-first evidence for the drop-in claim: every entry runs the SAME
call against both implementations over several seeded random inputs and
asserts the documented tolerance (0 = bit-exact).  Complements the
targeted per-area suites with input diversity.
"""
import numpy as np
import pytest

import rustcv_tpu.cv2 as R

cv2 = pytest.importorskip("cv2")

from tests._seeds import diff_seeds

SEEDS = diff_seeds(5)


def _u8(rng, h=24, w=32, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return rng.randint(0, 256, shape, dtype=np.uint8)


def _f32(rng, h=24, w=32, c=None):
    shape = (h, w) if c is None else (h, w, c)
    return (rng.rand(*shape) * 255).astype(np.float32)


def _exact(g, w):
    np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _close(atol):
    def cmp(g, w):
        np.testing.assert_allclose(np.asarray(g, np.float64),
                                   np.asarray(w, np.float64), atol=atol)
    return cmp


def _lsb(n):
    def cmp(g, w):
        d = np.abs(np.asarray(g, np.int64) - np.asarray(w, np.int64))
        assert d.max() <= n, d.max()
    return cmp


def _rel(rtol):
    def cmp(g, w):
        np.testing.assert_allclose(np.asarray(g, np.float64),
                                   np.asarray(w, np.float64),
                                   rtol=rtol, atol=1e-6)
    return cmp


def _lsb_rare(n, frac):
    # ≤n LSB on at most `frac` of pixels (knife-edge .5 rounding jitter)
    def cmp(g, w):
        d = np.abs(np.asarray(g, np.int64) - np.asarray(w, np.int64))
        assert d.max() <= n, d.max()
        assert (d > 0).mean() <= frac, (d > 0).mean()
    return cmp


# (name, input builder, call, comparator)
CASES = [
    ("cvtColor BGR2GRAY", lambda r: (_u8(r, c=3),),
     lambda m, a: m.cvtColor(a, m.COLOR_BGR2GRAY), _exact),
    ("cvtColor BGR2HSV", lambda r: (_u8(r, c=3),),
     lambda m, a: m.cvtColor(a, m.COLOR_BGR2HSV), _exact),
    ("cvtColor BGR2YCrCb", lambda r: (_u8(r, c=3),),
     lambda m, a: m.cvtColor(a, m.COLOR_BGR2YCrCb), _exact),
    ("cvtColor BGR2LAB", lambda r: (_u8(r, c=3),),
     lambda m, a: m.cvtColor(a, m.COLOR_BGR2LAB), _exact),
    ("threshold BINARY", lambda r: (_u8(r),),
     lambda m, a: m.threshold(a, 127, 255, m.THRESH_BINARY)[1], _exact),
    ("threshold OTSU", lambda r: (_u8(r),),
     lambda m, a: m.threshold(a, 0, 255, m.THRESH_BINARY
                              + m.THRESH_OTSU)[0], _close(0)),
    ("adaptiveThreshold", lambda r: (_u8(r),),
     lambda m, a: m.adaptiveThreshold(a, 255, m.ADAPTIVE_THRESH_MEAN_C,
                                      m.THRESH_BINARY, 5, 2), _exact),
    ("GaussianBlur", lambda r: (_u8(r),),
     lambda m, a: m.GaussianBlur(a, (5, 5), 1.5), _lsb(1)),
    ("blur", lambda r: (_u8(r),),
     lambda m, a: m.blur(a, (3, 3)), _lsb(1)),
    ("medianBlur", lambda r: (_u8(r),),
     lambda m, a: m.medianBlur(a, 3), _exact),
    ("boxFilter f32", lambda r: (_f32(r),),
     lambda m, a: m.boxFilter(a, -1, (3, 3)), _close(1e-2)),
    ("Sobel 16S", lambda r: (_u8(r),),
     lambda m, a: m.Sobel(a, m.CV_16S, 1, 0), _exact),
    ("Scharr", lambda r: (_u8(r),),
     lambda m, a: m.Scharr(a, m.CV_16S, 0, 1), _exact),
    ("Laplacian", lambda r: (_u8(r),),
     lambda m, a: m.Laplacian(a, m.CV_16S, ksize=3), _exact),
    ("erode", lambda r: (_u8(r),),
     lambda m, a: m.erode(a, np.ones((3, 3), np.uint8)), _exact),
    ("dilate cross", lambda r: (_u8(r),),
     lambda m, a: m.dilate(a, m.getStructuringElement(m.MORPH_CROSS,
                                                      (3, 3))), _exact),
    ("morphologyEx GRADIENT", lambda r: (_u8(r),),
     lambda m, a: m.morphologyEx(a, m.MORPH_GRADIENT,
                                 np.ones((3, 3), np.uint8)), _exact),
    ("copyMakeBorder reflect101", lambda r: (_u8(r, c=3),),
     lambda m, a: m.copyMakeBorder(a, 2, 3, 1, 4, m.BORDER_REFLECT_101),
     _exact),
    ("equalizeHist", lambda r: (_u8(r),),
     lambda m, a: m.equalizeHist(a), _exact),
    ("calcHist", lambda r: (_u8(r),),
     lambda m, a: m.calcHist([a], [0], None, [32], [0, 256]), _exact),
    ("add sat", lambda r: (_u8(r), _u8(r)),
     lambda m, a, b: m.add(a, b), _exact),
    ("subtract sat", lambda r: (_u8(r), _u8(r)),
     lambda m, a, b: m.subtract(a, b), _exact),
    ("addWeighted", lambda r: (_u8(r), _u8(r)),
     lambda m, a, b: m.addWeighted(a, 0.7, b, 0.4, 10), _lsb(1)),
    ("absdiff", lambda r: (_u8(r), _u8(r)),
     lambda m, a, b: m.absdiff(a, b), _exact),
    ("bitwise_and", lambda r: (_u8(r), _u8(r)),
     lambda m, a, b: m.bitwise_and(a, b), _exact),
    ("LUT", lambda r: (_u8(r), r.randint(0, 256, 256).astype(np.uint8)),
     lambda m, a, lut: m.LUT(a, lut), _exact),
    ("normalize MINMAX", lambda r: (_u8(r),),
     lambda m, a: m.normalize(a, None, 0, 255, m.NORM_MINMAX), _lsb(1)),
    ("minMaxLoc", lambda r: (_f32(r),),
     lambda m, a: m.minMaxLoc(a), lambda g, w: g == w),
    ("norm L2", lambda r: (_u8(r),),
     lambda m, a: m.norm(a, m.NORM_L2), _close(1e-6)),
    ("flip", lambda r: (_u8(r, c=3),),
     lambda m, a: m.flip(a, -1), _exact),
    ("rotate 90CW", lambda r: (_u8(r, c=3),),
     lambda m, a: m.rotate(a, m.ROTATE_90_CLOCKWISE), _exact),
    ("transpose", lambda r: (_u8(r),),
     lambda m, a: m.transpose(a), _exact),
    ("resize NN", lambda r: (_u8(r, c=3),),
     lambda m, a: m.resize(a, (17, 13), interpolation=m.INTER_NEAREST),
     _exact),
    ("resize linear dn", lambda r: (_u8(r, c=3),),
     lambda m, a: m.resize(a, (17, 13), interpolation=m.INTER_LINEAR),
     _exact),
    ("resize linear up", lambda r: (_u8(r),),
     lambda m, a: m.resize(a, (47, 31), interpolation=m.INTER_LINEAR),
     _exact),
    ("resize linear 2x reroute", lambda r: (_u8(r),),
     lambda m, a: m.resize(a, (16, 12), interpolation=m.INTER_LINEAR),
     _exact),
    ("resize area 2x", lambda r: (_u8(r),),
     lambda m, a: m.resize(a, (16, 12), interpolation=m.INTER_AREA),
     _exact),
    ("resize area 3x", lambda r: (_u8(r, c=3),),
     lambda m, a: m.resize(a, (10, 8), interpolation=m.INTER_AREA),
     _exact),
    ("resize area frac dn", lambda r: (_u8(r),),
     lambda m, a: m.resize(a, (13, 11), interpolation=m.INTER_AREA),
     _exact),
    ("resize area up", lambda r: (_u8(r),),
     lambda m, a: m.resize(a, (41, 29), interpolation=m.INTER_AREA),
     _exact),
    ("resize area mixed", lambda r: (_u8(r),),
     lambda m, a: m.resize(a, (41, 11), interpolation=m.INTER_AREA),
     _exact),
    ("resize cubic", lambda r: (_u8(r, c=3),),
     lambda m, a: m.resize(a, (41, 30), interpolation=m.INTER_CUBIC),
     _lsb_rare(1, 0.005)),
    ("resize lanczos4", lambda r: (_u8(r, c=3),),
     lambda m, a: m.resize(a, (41, 30), interpolation=m.INTER_LANCZOS4),
     _exact),
    ("warpAffine", lambda r: (_u8(r),),
     lambda m, a: m.warpAffine(a, np.float32([[1, 0.1, 2],
                                              [-0.05, 1, 1]]), (32, 24)),
     _exact),
    # cv2 5's warp evaluates coordinates blockwise with ~1e-6 f32 jitter;
    # pixels whose interpolated value sits exactly on a .5 boundary can
    # flip by 1 LSB vs our clean float64 coordinates (~1 px per 300k)
    ("warpAffine border+bval", lambda r: (_u8(r, c=3),),
     lambda m, a: m.warpAffine(a, np.float32([[0.9, 0.2, -3],
                                              [-0.1, 1.1, 2]]), (30, 20),
                               borderValue=(7, 9, 11)), _lsb(1)),
    ("warpAffine NEAREST", lambda r: (_u8(r),),
     lambda m, a: m.warpAffine(a, np.float32([[1.1, 0.1, 2],
                                              [-0.05, 0.9, 1]]), (32, 24),
                               flags=m.INTER_NEAREST), _exact),
    ("warpPerspective", lambda r: (_u8(r),),
     lambda m, a: m.warpPerspective(a, np.float64(
         [[1, 0.1, 2], [0.05, 1.1, 1], [0.001, 0.002, 1]]), (32, 24)),
     _lsb(1)),  # same .5-boundary coordinate-jitter caveat as above
    ("remap linear", lambda r: (_u8(r),
                                (r.rand(24, 32) * 33 - 1).astype(np.float32),
                                (r.rand(24, 32) * 25 - 1).astype(np.float32)),
     lambda m, a, mx, my: m.remap(a, mx, my, m.INTER_LINEAR), _exact),
    ("remap linear replicate", lambda r: (
        _u8(r), (r.rand(24, 32) * 33 - 1).astype(np.float32),
        (r.rand(24, 32) * 25 - 1).astype(np.float32)),
     lambda m, a, mx, my: m.remap(a, mx, my, m.INTER_LINEAR,
                                  borderMode=m.BORDER_REPLICATE), _exact),
    ("integral", lambda r: (_u8(r),),
     lambda m, a: m.integral(a), _exact),
    ("filter2D", lambda r: (_u8(r),),
     lambda m, a: m.filter2D(a, -1, np.float32([[0, 1, 0], [1, -3, 1],
                                                [0, 1, 0]])), _lsb(1)),
    ("pyrDown", lambda r: (_u8(r),),
     lambda m, a: m.pyrDown(a), _lsb(1)),
    ("pyrUp", lambda r: (_u8(r),),
     lambda m, a: m.pyrUp(a), _lsb(1)),
    ("dft/idft roundtrip", lambda r: (_f32(r, 16, 16),),
     lambda m, a: m.idft(m.dft(a), flags=m.DFT_SCALE), _close(1e-3)),
    ("dct", lambda r: (_f32(r, 16, 16),),
     lambda m, a: m.dct(a), _close(1e-3)),
    ("mulSpectrums", lambda r: (_f32(r, 16, 16), _f32(r, 16, 16)),
     lambda m, a, b: m.mulSpectrums(m.dft(a), m.dft(b), 0),
     _rel(1e-3)),  # both sides compute the CCS product in float32
    # cv2's masked path accumulates the chamfer steps in float32; our
    # integer fixed-point closure agrees to ~2e-5
    ("distanceTransform L2", lambda r: ((_u8(r) > 64).astype(np.uint8),),
     lambda m, a: m.distanceTransform(a, m.DIST_L2, 3), _close(1e-4)),
    ("distanceTransform L2 mask5",
     lambda r: ((_u8(r) > 64).astype(np.uint8),),
     lambda m, a: m.distanceTransform(a, m.DIST_L2, 5), _close(1e-4)),
    ("distanceTransform L1", lambda r: ((_u8(r) > 64).astype(np.uint8),),
     lambda m, a: m.distanceTransform(a, m.DIST_L1, 3), _exact),
    ("distanceTransform C", lambda r: ((_u8(r) > 64).astype(np.uint8),),
     lambda m, a: m.distanceTransform(a, m.DIST_C, 3), _exact),
    ("connectedComponents", lambda r: ((_u8(r) > 160).astype(np.uint8),),
     lambda m, a: m.connectedComponents(a)[0], lambda g, w: g == w),
    ("moments", lambda r: ((_u8(r) > 128).astype(np.uint8) * 255,),
     lambda m, a: sorted(m.moments(a, True).items()),
     lambda g, w: all(abs(gv - wv) < 1e-6 for (_, gv), (_, wv)
                      in zip(g, w))),
    ("boundingRect", lambda r: ((_u8(r) > 200).astype(np.uint8),),
     lambda m, a: m.boundingRect(a), lambda g, w: tuple(g) == tuple(w)),
    ("countNonZero", lambda r: (_u8(r),),
     lambda m, a: m.countNonZero(a), lambda g, w: g == w),
    ("meanStdDev", lambda r: (_u8(r, c=3),),
     lambda m, a: m.meanStdDev(a),
     lambda g, w: np.allclose(np.asarray(g[0]).ravel(),
                              np.asarray(w[0]).ravel())
     and np.allclose(np.asarray(g[1]).ravel(),
                     np.asarray(w[1]).ravel())),
    ("matchTemplate CCOEFF_NORMED",
     lambda r: (_u8(r), _u8(r, 8, 10)),
     lambda m, a, t: m.matchTemplate(a, t, m.TM_CCOEFF_NORMED),
     _close(1e-4)),
    ("cornerHarris", lambda r: (_u8(r),),
     lambda m, a: m.cornerHarris(a, 2, 3, 0.04), _close(2.0)),
    ("getPerspectiveTransform",
     lambda r: (np.float32(r.rand(4, 2) * 30 + [[0, 0]]),
                np.float32(r.rand(4, 2) * 30 + [[5, 5]])),
     # random quads are near-degenerate; LU pivoting order differs from
     # cv2's hal, so agreement is relative to conditioning
     lambda m, a, b: m.getPerspectiveTransform(a, b), _rel(1e-4)),
    ("invertAffineTransform",
     lambda r: (np.float64([[1, 0.2, 3], [0.1, 0.9, -2]]),),
     lambda m, a: m.invertAffineTransform(a), _close(1e-10)),
    ("perspectiveTransform",
     lambda r: (np.float32(r.rand(6, 1, 2) * 20),
                np.float64([[1, 0.1, 2], [0.05, 1.1, 1],
                            [0.001, 0.002, 1]])),
     lambda m, a, h: m.perspectiveTransform(a, h), _close(1e-3)),
    ("solve", lambda r: (r.rand(4, 4) + np.eye(4) * 4, r.rand(4, 1)),
     lambda m, a, b: m.solve(a, b)[1], _close(1e-8)),
    ("determinant", lambda r: (r.rand(3, 3),),
     lambda m, a: m.determinant(a), lambda g, w: abs(g - w) < 1e-10),
    ("sortIdx", lambda r: (r.rand(6, 8).astype(np.float32),),
     lambda m, a: m.sortIdx(a, m.SORT_EVERY_ROW + m.SORT_ASCENDING),
     _exact),
    ("compare GE", lambda r: (_u8(r), _u8(r)),
     lambda m, a, b: m.compare(a, b, m.CMP_GE), _exact),
    ("inRange", lambda r: (_u8(r, c=3),),
     lambda m, a: m.inRange(a, (20, 30, 40), (200, 210, 220)), _exact),
    ("convertScaleAbs", lambda r: (_u8(r),),
     lambda m, a: m.convertScaleAbs(a, alpha=1.5, beta=-20), _lsb(1)),
    ("reduce SUM", lambda r: (_u8(r),),
     lambda m, a: m.reduce(a, 0, m.REDUCE_SUM, dtype=m.CV_32S), _exact),
    ("mixChannels", lambda r: (_u8(r, c=3),),
     lambda m, a: m.extractChannel(a, 1), _exact),
    ("convexHull", lambda r: ((r.rand(20, 1, 2) * 50).astype(np.float32),),
     lambda m, a: m.convexHull(a), _close(1e-5)),
    ("convexHull cw int", lambda r: (r.randint(0, 40, (15, 1, 2))
                                     .astype(np.int32),),
     lambda m, a: m.convexHull(a, clockwise=True), _exact),
    ("convexHull indices", lambda r: ((r.rand(20, 1, 2) * 50)
                                      .astype(np.float32),),
     lambda m, a: m.convexHull(a, returnPoints=False), _exact),
    ("contourArea", lambda r: ((r.rand(8, 1, 2) * 50).astype(np.float32),),
     lambda m, a: m.contourArea(m.convexHull(a)),
     lambda g, w: abs(g - w) < 1e-4),
    ("HuMoments", lambda r: ((_u8(r) > 128).astype(np.uint8) * 255,),
     lambda m, a: m.HuMoments(m.moments(a, True)), _close(1e-8)),
]


@pytest.mark.parametrize("name,gen,call,cmp",
                         CASES, ids=[c[0] for c in CASES])
def test_differential(name, gen, call, cmp):
    for seed in SEEDS:
        rng = np.random.RandomState(seed)
        args_g = gen(rng)
        rng = np.random.RandomState(seed)
        args_w = gen(rng)
        g = call(R, *args_g)
        w = call(cv2, *args_w)
        if callable(cmp) and cmp.__name__ == "<lambda>":
            assert cmp(g, w), (name, seed)
        else:
            try:
                cmp(g, w)
            except AssertionError as e:
                raise AssertionError(f"{name} seed={seed}: {e}") from e


@pytest.mark.parametrize("interp,tol", [
    (1, None), (3, None), (4, None),      # bit-exact modes
    (2, (1, 0.005)),                      # cubic: cv2 fma jitter envelope
])
def test_resize_u8_random_sizes(interp, tol):
    """Random (src, dst) size pairs across every dispatch branch."""
    rng = np.random.RandomState(interp)
    for _ in range(60):
        sh, sw = rng.randint(1, 70), rng.randint(1, 70)
        h, w = rng.randint(1, 80), rng.randint(1, 80)
        a = rng.randint(0, 256, (sh, sw), np.uint8)
        g = cv2.resize(a, (w, h), interpolation=interp)
        m = R.resize(a, (w, h), interpolation=interp)
        if tol is None:
            np.testing.assert_array_equal(g, m, err_msg=f"{(sh,sw)}->{(h,w)}")
        else:
            d = np.abs(g.astype(int) - np.asarray(m).astype(int))
            assert d.max() <= tol[0] and (d > 0).mean() <= tol[1], \
                f"{(sh, sw)}->{(h, w)}: max {d.max()} frac {(d > 0).mean()}"

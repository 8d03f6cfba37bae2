"""Round-3b core completeness batch vs OpenCV 5.0."""

import numpy as np
import pytest

from rustcv_tpu.ops import core_ops as co

cv2 = pytest.importorskip("cv2")


def test_accumulate_family(rng):
    img = rng.integers(0, 256, (9, 11), np.uint8)
    img2 = rng.integers(0, 256, (9, 11), np.uint8)
    mask = (rng.random((9, 11)) > 0.5).astype(np.uint8)

    acc = rng.random((9, 11)).astype(np.float32) * 10
    ref = acc.copy()
    cv2.accumulate(img, ref, mask)
    np.testing.assert_allclose(co.accumulate(img, acc, mask), ref,
                               rtol=1e-6)
    ref = acc.copy()
    cv2.accumulateSquare(img, ref)
    np.testing.assert_allclose(co.accumulate_square(img, acc), ref,
                               rtol=1e-6)
    ref = acc.copy()
    cv2.accumulateProduct(img, img2, ref)
    np.testing.assert_allclose(co.accumulate_product(img, img2, acc),
                               ref, rtol=1e-6)


def test_blur_box_filter(rng):
    img = rng.integers(0, 256, (24, 30), np.uint8)
    for k in ((3, 3), (5, 3), (7, 7)):
        ours = co.blur(img, k)
        ref = cv2.blur(img, k)
        assert np.abs(ours.astype(int)
                      - ref.astype(int)).max() <= 1, k
    s_ours = co.sqr_box_filter(img, (3, 3), normalize=True)
    s_ref = cv2.sqrBoxFilter(img.astype(np.float32), -1, (3, 3))
    np.testing.assert_allclose(s_ours[2:-2, 2:-2], s_ref[2:-2, 2:-2],
                               rtol=1e-4)


def test_blend_linear(rng):
    a = rng.integers(0, 256, (8, 9), np.uint8)
    b = rng.integers(0, 256, (8, 9), np.uint8)
    w1 = rng.random((8, 9)).astype(np.float32)
    w2 = rng.random((8, 9)).astype(np.float32)
    ref = cv2.blendLinear(a, b, w1, w2)
    ours = co.blend_linear(a, b, w1, w2)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_compare_hist(rng):
    h1 = rng.random(32).astype(np.float32) * 10
    h2 = rng.random(32).astype(np.float32) * 10
    for m, cvm in [("correl", cv2.HISTCMP_CORREL),
                   ("chisqr", cv2.HISTCMP_CHISQR),
                   ("intersect", cv2.HISTCMP_INTERSECT),
                   ("bhattacharyya", cv2.HISTCMP_BHATTACHARYYA),
                   ("chisqr_alt", cv2.HISTCMP_CHISQR_ALT),
                   ("kl_div", cv2.HISTCMP_KL_DIV)]:
        np.testing.assert_allclose(co.compare_hist(h1, h2, m),
                                   cv2.compareHist(h1, h2, cvm),
                                   rtol=1e-5, err_msg=m)


def test_hanning_window():
    for size in ((5, 4), (8, 8), (16, 7)):
        ours = co.create_hanning_window(size)
        ref = cv2.createHanningWindow(size, cv2.CV_32F)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_homogeneous_round_trip(rng):
    pts = rng.normal(0, 5, (7, 2))
    h = co.convert_points_to_homogeneous(pts)
    ref = cv2.convertPointsToHomogeneous(pts.astype(np.float64))
    np.testing.assert_allclose(h, ref.reshape(7, 3))
    back = co.convert_points_from_homogeneous(h * 2.5)
    np.testing.assert_allclose(back, pts, atol=1e-12)


def test_invert_affine(rng):
    m = np.array([[1.2, 0.3, 4.0], [0.1, 0.9, -2.0]])
    np.testing.assert_allclose(co.invert_affine_transform(m),
                               cv2.invertAffineTransform(m), atol=1e-12)


def test_solve_cubic_poly():
    n, roots = co.solve_cubic([1.0, -6.0, 11.0, -6.0])
    assert n == 3
    np.testing.assert_allclose(roots, [1, 2, 3], atol=1e-9)
    r = co.solve_poly([-6.0, 11.0, -6.0, 1.0])
    np.testing.assert_allclose(r[:, 0], [1, 2, 3], atol=1e-9)
    np.testing.assert_allclose(r[:, 1], 0, atol=1e-9)
    n2, roots2 = co.solve_cubic([0.0, 1.0, -3.0, 2.0])  # quadratic
    assert n2 == 2 and np.allclose(roots2[:2], [1, 2])


def test_misc_utilities(rng):
    m = rng.normal(0, 1, (4, 4))
    sym = co.complete_symm(m)
    assert np.allclose(sym, sym.T)
    assert np.allclose(np.triu(sym), np.triu(m))
    assert abs(co.trace(m) - np.trace(m)) < 1e-12
    np.testing.assert_allclose(co.mul_transposed(m),
                               cv2.mulTransposed(m, True), atol=1e-12)
    c3 = rng.integers(0, 255, (5, 6, 3), np.uint8)
    np.testing.assert_array_equal(co.extract_channel(c3, 1),
                                  cv2.extractChannel(c3, 1))
    plane = rng.integers(0, 255, (5, 6), np.uint8)
    ins = co.insert_channel(plane, c3, 2)
    assert (ins[..., 2] == plane).all() and (ins[..., 0]
                                             == c3[..., 0]).all()
    assert co.has_non_zero(np.array([0, 0, 1]))
    assert not co.has_non_zero(np.zeros(4))
    x = np.array([1.0, np.nan, 3.0])
    np.testing.assert_array_equal(co.patch_nans(x, 9.0), [1, 9, 3])
    np.testing.assert_allclose(co.sum_elems(c3),
                               cv2.sumElems(c3)[:3], rtol=1e-12)


def test_reduce_arg(rng):
    m = rng.integers(0, 9, (5, 7)).astype(np.float32)
    np.testing.assert_array_equal(co.reduce_arg_max(m, 0),
                                  cv2.reduceArgMax(m, 0))
    np.testing.assert_array_equal(co.reduce_arg_min(m, 1),
                                  cv2.reduceArgMin(m, 1))


def test_mul_div_saturation(rng):
    a = rng.integers(0, 256, (6, 7), np.uint8)
    b = rng.integers(0, 256, (6, 7), np.uint8)
    ours = co.multiply_u8(a, b, scale=1 / 16.0)
    ref = cv2.multiply(a, b, scale=1 / 16.0)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    ours = co.divide_u8(a, np.maximum(b, 0), scale=4.0)
    ref = cv2.divide(a, np.maximum(b, 0), scale=4.0)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_rand_shuffle_deterministic():
    a = np.arange(20)
    s1 = co.rand_shuffle(a, co.RNG(5))
    s2 = co.rand_shuffle(a, co.RNG(5))
    np.testing.assert_array_equal(s1, s2)
    assert sorted(s1.tolist()) == list(range(20))
    assert (s1 != a).any()

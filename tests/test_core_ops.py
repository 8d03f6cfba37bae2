"""Core array ops vs OpenCV 5.0 (the first module cross-validated
against the real cv2 — available in this image) plus jax-twin equality."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import core_ops as co

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(1234)
    return rng.integers(0, 256, (37, 53), np.uint8)


# ---------------------------------------------------------------------------
# borders


@pytest.mark.parametrize("bt,cvb", [
    ("constant", cv2.BORDER_CONSTANT),
    ("replicate", cv2.BORDER_REPLICATE),
    ("reflect", cv2.BORDER_REFLECT),
    ("reflect101", cv2.BORDER_REFLECT_101),
    ("wrap", cv2.BORDER_WRAP),
])
def test_copy_make_border_vs_cv2(img, bt, cvb):
    ours = co.copy_make_border(img, 3, 5, 2, 7, bt, value=9)
    ref = cv2.copyMakeBorder(img, 3, 5, 2, 7, cvb, value=9)
    np.testing.assert_array_equal(ours, ref)
    dev = co.copy_make_border(jnp.asarray(img), 3, 5, 2, 7, bt, value=9)
    np.testing.assert_array_equal(np.asarray(dev), ref)


def test_copy_make_border_wide_pad(img):
    # pads wider than the image itself (reflect continues folding)
    for bt, cvb in [("reflect", cv2.BORDER_REFLECT),
                    ("wrap", cv2.BORDER_WRAP),
                    ("replicate", cv2.BORDER_REPLICATE)]:
        ours = co.copy_make_border(img[:5, :4], 7, 7, 9, 9, bt)
        ref = cv2.copyMakeBorder(img[:5, :4], 7, 7, 9, 9, cvb)
        np.testing.assert_array_equal(ours, ref)


def test_copy_make_border_color(img):
    c = np.stack([img, img // 2, img // 3], -1)
    ours = co.copy_make_border(c, 1, 2, 3, 4, "reflect101")
    ref = cv2.copyMakeBorder(c, 1, 2, 3, 4, cv2.BORDER_REFLECT_101)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# channels


def test_split_merge_mix(img):
    c = np.stack([img, img // 2, img // 3], -1)
    planes = co.split(c)
    for i, p in enumerate(planes):
        np.testing.assert_array_equal(p, c[..., i])
    np.testing.assert_array_equal(co.merge_channels(planes), c)

    # BGR→RGB reroute + an alpha zero-fill, vs cv2.mixChannels
    rgba = co.mix_channels([c], [4], [0, 2, 1, 1, 2, 0, -1, 3])[0]
    ref = np.zeros((*img.shape, 4), np.uint8)
    cv2.mixChannels([c], [ref], np.array([0, 2, 1, 1, 2, 0], np.int32))
    np.testing.assert_array_equal(rgba[..., :3], ref[..., :3])
    assert int(rgba[..., 3].max()) == 0


# ---------------------------------------------------------------------------
# polar


def test_fast_atan2_vs_cv2(rng):
    y = rng.normal(0, 3, 257).astype(np.float32)
    x = rng.normal(0, 3, 257).astype(np.float32)
    ref = np.array([cv2.fastAtan2(float(yy), float(xx))
                    for yy, xx in zip(y, x)], np.float32)
    np.testing.assert_allclose(co.fast_atan2(y, x), ref, atol=2e-3)
    assert abs(co.fast_atan2(1.0, 1.0) - 44.990455627) < 1e-4


def test_cart_to_polar_vs_cv2(rng):
    x = rng.normal(0, 5, (17, 31)).astype(np.float32)
    y = rng.normal(0, 5, (17, 31)).astype(np.float32)
    mag, ang = co.cart_to_polar(x, y, angle_in_degrees=True)
    rmag, rang = cv2.cartToPolar(x, y, angleInDegrees=True)
    np.testing.assert_allclose(mag, rmag, rtol=1e-6)
    np.testing.assert_allclose(ang, rang, atol=2e-3)
    # radians mode uses the same polynomial (OpenCV quirk preserved)
    np.testing.assert_allclose(co.phase(x, y), cv2.phase(x, y), atol=1e-4)
    # device twin agrees with the host spec
    dmag, dang = co.cart_to_polar(jnp.asarray(x), jnp.asarray(y), True)
    np.testing.assert_allclose(np.asarray(dang), ang, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dmag), mag, rtol=1e-5)


def test_polar_to_cart_round_trip(rng):
    x = rng.normal(0, 5, 64).astype(np.float32)
    y = rng.normal(0, 5, 64).astype(np.float32)
    mag, ang = co.cart_to_polar(x, y)
    x2, y2 = co.polar_to_cart(mag, ang)
    np.testing.assert_allclose(x2, x, atol=2e-3)
    np.testing.assert_allclose(y2, y, atol=2e-3)
    rx, ry = cv2.polarToCart(mag, ang)
    np.testing.assert_allclose(x2, rx.ravel(), atol=1e-3)
    np.testing.assert_allclose(y2, ry.ravel(), atol=1e-3)


# ---------------------------------------------------------------------------
# compare / scan / reduce / sort


def test_compare_vs_cv2(img):
    b = np.full_like(img, 128)
    for op, cvop in [("eq", cv2.CMP_EQ), ("ne", cv2.CMP_NE),
                     ("gt", cv2.CMP_GT), ("ge", cv2.CMP_GE),
                     ("lt", cv2.CMP_LT), ("le", cv2.CMP_LE)]:
        np.testing.assert_array_equal(co.compare(img, b, op),
                                      cv2.compare(img, b, cvop))


def test_find_non_zero(img):
    mask = (img > 200).astype(np.uint8)
    ref = cv2.findNonZero(mask)
    ours = co.find_non_zero(mask)
    np.testing.assert_array_equal(ours, ref.reshape(-1, 2))


def test_reduce_vs_cv2(rng):
    m = rng.normal(0, 10, (9, 13)).astype(np.float32)
    for dim in (0, 1):
        for rt, cvr in [("sum", cv2.REDUCE_SUM), ("avg", cv2.REDUCE_AVG),
                        ("max", cv2.REDUCE_MAX), ("min", cv2.REDUCE_MIN)]:
            ours = co.reduce_mat(m, dim, rt).astype(np.float32)
            ref = cv2.reduce(m, dim, cvr)
            np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_sort_vs_cv2(rng):
    m = rng.integers(0, 5, (8, 11)).astype(np.float32)  # heavy ties
    for axis, base in [(1, cv2.SORT_EVERY_ROW), (0, cv2.SORT_EVERY_COLUMN)]:
        for desc, flag in [(False, cv2.SORT_ASCENDING),
                           (True, cv2.SORT_DESCENDING)]:
            np.testing.assert_array_equal(
                co.sort_mat(m, axis, desc), cv2.sort(m, base | flag))
            # sortIdx must yield the same sorted VALUES (tie index
            # order is unspecified between implementations)
            idx = co.sort_idx(m, axis, desc)
            np.testing.assert_array_equal(
                np.take_along_axis(m, idx, axis),
                cv2.sort(m, base | flag))
    dev = co.sort_mat(jnp.asarray(m), 1, True)
    np.testing.assert_array_equal(np.asarray(dev), co.sort_mat(m, 1, True))


def test_concat_repeat(img):
    np.testing.assert_array_equal(co.hconcat([img, img]),
                                  cv2.hconcat([img, img]))
    np.testing.assert_array_equal(co.vconcat([img, img]),
                                  cv2.vconcat([img, img]))
    np.testing.assert_array_equal(co.repeat_mat(img, 2, 3),
                                  cv2.repeat(img, 2, 3))


# ---------------------------------------------------------------------------
# point transforms


def test_transform_points_vs_cv2(rng):
    pts = rng.normal(0, 10, (12, 2)).astype(np.float32)
    m = np.array([[1.2, -0.3, 4.0], [0.5, 0.9, -2.0]], np.float32)
    ref = cv2.transform(pts.reshape(-1, 1, 2), m).reshape(-1, 2)
    np.testing.assert_allclose(co.transform_points(pts, m), ref, atol=1e-4)


def test_perspective_transform_vs_cv2(rng):
    pts = rng.normal(0, 4, (9, 2)).astype(np.float32)
    h = np.array([[1.1, 0.1, 3.0], [-0.2, 0.9, 1.0],
                  [0.01, -0.02, 1.0]], np.float32)
    ref = cv2.perspectiveTransform(pts.reshape(-1, 1, 2), h).reshape(-1, 2)
    np.testing.assert_allclose(co.perspective_transform(pts, h), ref,
                               rtol=1e-4, atol=1e-4)


def test_get_affine_transform_vs_cv2():
    src = np.float32([[0, 0], [10, 2], [3, 8]])
    dst = np.float32([[2, 3], [11, 7], [1, 12]])
    np.testing.assert_allclose(co.get_affine_transform(src, dst),
                               cv2.getAffineTransform(src, dst), atol=1e-10)


# ---------------------------------------------------------------------------
# linalg


def test_gemm_vs_cv2(rng):
    a = rng.normal(0, 1, (4, 5))
    b = rng.normal(0, 1, (4, 6))
    c = rng.normal(0, 1, (5, 6))
    ours = co.gemm(a, b, 1.5, c, 0.5, transpose_a=True)
    ref = cv2.gemm(a, b, 1.5, c, 0.5, flags=cv2.GEMM_1_T)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_invert_solve(rng):
    a = rng.normal(0, 1, (5, 5))
    a = a @ a.T + 5 * np.eye(5)
    ok, inv = co.invert(a)
    assert ok and np.allclose(inv @ a, np.eye(5), atol=1e-10)
    _, ref = cv2.invert(a)
    np.testing.assert_allclose(inv, ref, atol=1e-10)
    # SVD pseudo-inverse of a rank-deficient matrix
    r = rng.normal(0, 1, (4, 2))
    m = r @ r.T  # rank 2
    ratio, pinv = co.invert(m, "svd")
    np.testing.assert_allclose(pinv, np.linalg.pinv(m), atol=1e-10)
    assert ratio < 1e-12
    b = rng.normal(0, 1, 5)
    ok, x = co.solve(a, b)
    assert ok and np.allclose(a @ x.ravel(), b, atol=1e-10)
    # least squares matches cv2 DECOMP_SVD
    am = rng.normal(0, 1, (8, 3))
    bm = rng.normal(0, 1, (8, 1))
    ok, x = co.solve(am, bm, "svd")
    rok, rx = cv2.solve(am, bm, flags=cv2.DECOMP_SVD)
    assert ok and rok
    np.testing.assert_allclose(x, rx, atol=1e-10)


def test_eigen_svd_vs_cv2(rng):
    m = rng.normal(0, 1, (4, 4))
    m = (m + m.T) / 2
    ok, w, v = co.eigen(m)
    rok, rw, rv = cv2.eigen(m)
    assert ok and rok
    np.testing.assert_allclose(w, rw.ravel(), atol=1e-10)
    for i in range(4):  # eigenvectors defined up to sign
        assert np.allclose(v[i], rv[i], atol=1e-8) or \
            np.allclose(v[i], -rv[i], atol=1e-8)
    a = rng.normal(0, 1, (5, 3))
    w, u, vt = co.sv_decomp(a)
    np.testing.assert_allclose(u * w.ravel() @ vt, a, atol=1e-12)
    rhs = rng.normal(0, 1, 5)
    x = co.sv_back_subst(w, u, vt, rhs)
    np.testing.assert_allclose(x.ravel(),
                               np.linalg.lstsq(a, rhs, rcond=None)[0],
                               atol=1e-10)


def test_pca_covar_mahalanobis_vs_cv2(rng):
    data = rng.normal(0, 1, (40, 6)) * [5, 4, 3, 2, 1, 0.5]
    mu, vecs, vals = co.pca_compute(data, max_components=3)
    rmu, rvecs = cv2.PCACompute(data, mean=None, maxComponents=3)
    np.testing.assert_allclose(mu, rmu.ravel(), atol=1e-10)
    for i in range(3):
        assert np.allclose(vecs[i], rvecs[i], atol=1e-8) or \
            np.allclose(vecs[i], -rvecs[i], atol=1e-8)
    proj = co.pca_project(data, mu, vecs)
    back = co.pca_back_project(proj, mu, vecs)
    assert back.shape == data.shape
    # projection round-trip error only in the truncated directions
    assert np.linalg.norm(back - data) < np.linalg.norm(data)

    cov, cmu = co.calc_covar_matrix(data, scale=True)
    rcov, rcmu = cv2.calcCovarMatrix(
        data, None, cv2.COVAR_NORMAL | cv2.COVAR_ROWS | cv2.COVAR_SCALE)
    np.testing.assert_allclose(cov, rcov, atol=1e-10)
    np.testing.assert_allclose(cmu.ravel(), rcmu.ravel(), atol=1e-10)

    icov = np.linalg.inv(cov + 1e-6 * np.eye(6))
    v1, v2 = data[0], data[1]
    np.testing.assert_allclose(co.mahalanobis(v1, v2, icov),
                               cv2.Mahalanobis(v1, v2, icov), rtol=1e-10)


# ---------------------------------------------------------------------------
# RNG


def test_randu_bit_exact_vs_cv2():
    cv2.setRNGSeed(12345)
    ref_i = np.empty((3, 7), np.int32)
    cv2.randu(ref_i, 0, 1000)
    ours_i = co.RNG(12345).randu((3, 7), 0, 1000, np.int32)
    np.testing.assert_array_equal(ours_i, ref_i)

    cv2.setRNGSeed(99)
    ref_f = np.empty((2, 5), np.float32)
    cv2.randu(ref_f, -2.0, 3.0)
    ours_f = co.RNG(99).randu((2, 5), -2.0, 3.0, np.float32)
    np.testing.assert_allclose(ours_f, ref_f, rtol=1e-6)


def test_randn_moments():
    r = co.RNG(7)
    x = r.randn((20000,), 1.5, 2.0)
    assert abs(x.mean() - 1.5) < 0.05
    assert abs(x.std() - 2.0) < 0.05


def test_misc_small():
    np.testing.assert_array_equal(
        co.set_identity((3, 4), 2.0),
        np.array([[2, 0, 0, 0], [0, 2, 0, 0], [0, 0, 2, 0]], np.float64))
    a = np.array([[2.0, 1.0], [1.0, 2.0]])
    assert abs(co.determinant(a) - 3.0) < 1e-12
    np.testing.assert_allclose(co.scale_add(a, 2.0, np.eye(2)),
                               2 * a + np.eye(2))

"""Round-3b tail: batchDistance, divSpectrums, eigenNonSymmetric,
matMulDeriv, copyTo, ND utilities, approxPolyN — vs cv2 5.0."""

import numpy as np
import pytest

from rustcv_tpu.ops import core_ops as co
from rustcv_tpu.ops import shape

cv2 = pytest.importorskip("cv2")


def test_batch_distance_vs_cv2(rng):
    q = rng.random((5, 8)).astype(np.float32)
    t = rng.random((9, 8)).astype(np.float32)
    d, idx = co.batch_distance(q, t, k=3, norm="l2")
    rd, ridx = cv2.batchDistance(q, t, cv2.CV_32F, K=3,
                                 normType=cv2.NORM_L2)
    np.testing.assert_array_equal(idx, ridx)
    np.testing.assert_allclose(d, rd, rtol=1e-5)
    # hamming over packed bytes
    qb = rng.integers(0, 256, (4, 8), np.uint8)
    tb = rng.integers(0, 256, (6, 8), np.uint8)
    d, idx = co.batch_distance(qb, tb, k=1, norm="hamming")
    rd, ridx = cv2.batchDistance(qb, tb, cv2.CV_32S, K=1,
                                 normType=cv2.NORM_HAMMING)
    np.testing.assert_array_equal(idx, ridx)
    np.testing.assert_array_equal(d.astype(np.int32), rd)


def test_div_spectrums_vs_cv2(rng):
    x = rng.random((6, 8)).astype(np.float32)
    y = rng.random((6, 8)).astype(np.float32) + 0.2
    dx = cv2.dft(x, flags=cv2.DFT_COMPLEX_OUTPUT)
    dy = cv2.dft(y, flags=cv2.DFT_COMPLEX_OUTPUT)
    zx = dx[..., 0] + 1j * dx[..., 1]
    zy = dy[..., 0] + 1j * dy[..., 1]
    ours = co.div_spectrums(zx, zy)
    ref = cv2.divSpectrums(dx, dy, 0)
    np.testing.assert_allclose(ours.real, ref[..., 0], atol=1e-4)
    np.testing.assert_allclose(ours.imag, ref[..., 1], atol=1e-4)


def test_eigen_non_symmetric(rng):
    # construct a matrix with GUARANTEED real spectrum: A D A^-1
    local = np.random.default_rng(42)
    a = local.random((5, 5)) + np.eye(5)
    d = np.diag(local.random(5) * 3 + 1)
    m = a @ d @ np.linalg.inv(a)
    w, v = co.eigen_non_symmetric(m)
    rw, rv = cv2.eigenNonSymmetric(m)
    np.testing.assert_allclose(np.sort(w), np.sort(rw.ravel()),
                               atol=1e-8)
    # v rows are eigenvectors: ‖Mvᵀ − wvᵀ‖ small
    for i in range(5):
        r = m @ v[i] - w[i] * v[i]
        assert np.abs(r).max() < 1e-8


def test_mat_mul_deriv_vs_cv2(rng):
    a = rng.random((2, 3))
    b = rng.random((3, 4))
    da, db = co.mat_mul_deriv(a, b)
    rda, rdb = cv2.matMulDeriv(a, b)
    np.testing.assert_allclose(da, rda, atol=1e-12)
    np.testing.assert_allclose(db, rdb, atol=1e-12)


def test_copy_to_and_nd(rng):
    src = rng.integers(0, 255, (6, 7, 3), np.uint8)
    mask = (rng.random((6, 7)) > 0.5).astype(np.uint8)
    out = co.copy_to(src, mask)
    ref = cv2.copyTo(src, mask)
    np.testing.assert_array_equal(out, ref)
    m3 = rng.random((2, 3, 4))
    np.testing.assert_array_equal(co.flip_nd(m3, 1), np.flip(m3, 1))
    np.testing.assert_array_equal(co.transpose_nd(m3, (2, 0, 1)),
                                  m3.transpose(2, 0, 1))
    x = np.array([[1.0, np.nan], [np.inf, 3.0]])
    np.testing.assert_array_equal(co.finite_mask(x),
                                  [[255, 0], [0, 255]])


def test_approx_poly_n(rng):
    # regular 12-gon → 4 sides circumscribes it
    t = np.linspace(0, 2 * np.pi, 13)[:-1]
    poly = np.stack([50 + 20 * np.cos(t), 50 + 20 * np.sin(t)], 1)
    out = shape.approx_poly_n(poly, 4)
    assert out.shape == (4, 2)
    # circumscribing: every original vertex inside (or on) the result
    ref = cv2.approxPolyN(poly.astype(np.float32), 4).reshape(-1, 2)
    for q in poly:
        assert cv2.pointPolygonTest(out.astype(np.float32), tuple(q),
                                    True) >= -1e-3
    # area comparable to cv2's result (within 10%)
    ours_area = cv2.contourArea(out.astype(np.float32))
    ref_area = cv2.contourArea(ref)
    assert abs(ours_area - ref_area) < 0.1 * ref_area


def test_integral23_vs_cv2(rng):
    a = rng.integers(0, 256, (13, 17), np.uint8)
    s, sq = co.integral2(a)
    rs, rsq = cv2.integral2(a)
    np.testing.assert_array_equal(s, rs)
    np.testing.assert_allclose(sq, rsq)
    s, sq, t = co.integral3(a)
    rs, rsq, rt = cv2.integral3(a)
    np.testing.assert_array_equal(t, rt)


def test_threshold_with_mask(rng):
    img = rng.integers(0, 256, (8, 9), np.uint8)
    mask = (rng.random((8, 9)) > 0.5).astype(np.uint8)
    ours = co.threshold_with_mask(img, mask, 100, 255)
    ref = img.copy()
    cv2.thresholdWithMask(img, ref, mask, 100, 255, cv2.THRESH_BINARY)
    np.testing.assert_array_equal(ours, ref)


def test_ccm_recovers_cast(rng):
    # synthetic color cast: known affine transform of patch colors
    true_m = np.array([[0.9, 0.1, 0.0, 0.02],
                       [0.05, 0.8, 0.1, -0.01],
                       [0.0, 0.15, 0.85, 0.03]])
    ref = rng.random((24, 3))
    src = np.concatenate([ref, np.ones((24, 1))], 1) @ true_m.T
    m = co.color_correction_matrix(src, ref, affine=True)
    # applying the fitted CCM inverts the cast
    img = (src.reshape(4, 6, 3)).astype(np.float64)
    out = co.apply_ccm(img, m)
    np.testing.assert_allclose(out.reshape(-1, 3), ref, atol=1e-10)
    # u8 path saturates
    u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    out8 = co.apply_ccm(u8, m)
    assert out8.dtype == np.uint8


def test_solve_lp_vs_cv2():
    cases = [
        (np.array([3.0, 1.0]), np.array([[1., 1., 4.], [1., 0., 2.]])),
        (np.array([1.0, 0.0]), np.array([[0., 1., 4.]])),   # unbounded
        (np.array([1.0, 0.0]), np.array([[1., 0., -1.]])),  # unfeasible
        (np.array([2.0, 3.0, 1.0]),
         np.array([[1., 1., 1., 10.], [2., 1., 0., 8.],
                   [0., 1., 3., 9.]])),
        (np.array([1.0, 1.0]), np.array([[1., 1., 5.]])),   # multi
    ]
    for c, con in cases:
        s, x = co.solve_lp(c, con)
        ref = cv2.solveLP(c, con)
        assert s == ref[0], (c, s, ref[0])
        if ref[0] >= 0:
            np.testing.assert_allclose(x, np.asarray(ref[1]).ravel(),
                                       atol=1e-9)


def test_border_interpolate_vs_cv2():
    for bt, cvb in [("reflect101", cv2.BORDER_REFLECT_101),
                    ("reflect", cv2.BORDER_REFLECT),
                    ("replicate", cv2.BORDER_REPLICATE),
                    ("wrap", cv2.BORDER_WRAP)]:
        for p in (-7, -3, -1, 0, 5, 9, 10, 14, 23):
            assert co.border_interpolate(p, 10, bt) == \
                cv2.borderInterpolate(p, 10, cvb), (bt, p)
    assert co.border_interpolate(-1, 10, "constant") == -1


def test_rectangle_intersection_area():
    assert co.rectangle_intersection_area((0, 0, 4, 4),
                                          (2, 2, 4, 4)) == 4.0
    assert co.rectangle_intersection_area((0, 0, 2, 2),
                                          (3, 3, 2, 2)) == 0.0
    np.testing.assert_allclose(
        co.rectangle_intersection_area((0., 0., 4., 4.), (2., 2., 4., 4.)),
        cv2.rectangleIntersectionArea((0., 0., 4., 4.), (2., 2., 4., 4.)))


def test_build_mst():
    edges = [(0, 1, 2.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 0.5),
             (3, 3, -9.0),            # self-loop ignored
             (0, 1, 7.0)]             # parallel edge, heavier — ignored
    ok, mst = co.build_mst(4, edges)
    assert ok
    assert len(mst) == 3
    np.testing.assert_allclose(sorted(mst[:, 2]), [0.5, 1.0, 2.0])
    # disconnected
    ok2, _ = co.build_mst(4, [(0, 1, 1.0), (2, 3, 1.0)])
    assert not ok2
    # negative weights fine
    ok3, mst3 = co.build_mst(3, [(0, 1, -2.0), (1, 2, -1.0),
                                 (0, 2, -5.0)])
    assert ok3 and mst3[:, 2].sum() == -7.0


def test_cvt_color_two_plane(rng):
    import rustcv_tpu.imgproc as ip

    y = rng.integers(0, 256, (24, 32), np.uint8)
    uv = rng.integers(0, 256, (12, 16, 2), np.uint8)
    ours = ip.cvt_color_two_plane(y, uv)
    ref = cv2.cvtColorTwoPlane(y, uv, cv2.COLOR_YUV2BGR_NV12)
    # our NV12 kernel keeps the REFERENCE's frozen BT.601 integer spec
    # (decode.rs parity — the project's fidelity contract) and nearest
    # 2x2 chroma; cv2 rounds/upsamples differently: agreement is
    # sub-LSB on average with bounded outliers at saturation
    d = np.abs(ours.astype(float) - ref.astype(float))
    assert d.mean() < 1.0 and d.max() <= 32, (d.mean(), d.max())
    corr = np.corrcoef(ours.ravel().astype(float),
                       ref.ravel().astype(float))[0, 1]
    assert corr > 0.995


def test_get_rect_sub_pix_vs_cv2(rng):
    a = rng.integers(0, 256, (30, 40), np.uint8)
    for center in ((10.0, 10.0), (12.3, 7.8), (0.4, 0.2), (39.0, 29.0)):
        ours = co.get_rect_sub_pix(a, (5, 4), center)
        ref = cv2.getRectSubPix(a, (5, 4), center)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_get_text_size():
    import rustcv_tpu.imgproc as ip

    (w, h), baseline = ip.get_text_size("hello", 1.0)
    assert w > 20 and h > 8 and baseline >= 1
    (w2, _), _ = ip.get_text_size("hello world", 1.0)
    assert w2 > w
    (w3, h3), _ = ip.get_text_size("hello", 2.0)
    assert w3 > w and h3 > h

"""morphologyEx / filter2D / integral — device vs golden oracle parity."""

import numpy as np
import pytest

from rustcv_tpu.ops import filters, golden


@pytest.fixture
def img(jax_cpu):
    return np.random.default_rng(0).integers(0, 256, (64, 96), np.uint8)


class TestMorphologyEx:
    @pytest.mark.parametrize("op", golden.MORPH_OPS)
    @pytest.mark.parametrize("ksize", [3, 5])
    def test_exact(self, img, op, ksize):
        dev = np.asarray(filters.morphology_ex_u8(img, op, ksize))
        assert np.array_equal(dev, golden.morphology_ex(img, op, ksize))

    def test_bgr_channels(self, jax_cpu):
        rgb = np.random.default_rng(1).integers(0, 256, (32, 40, 3), np.uint8)
        dev = np.asarray(filters.morphology_ex_u8(rgb, "gradient", 3))
        assert np.array_equal(dev, golden.morphology_ex(rgb, "gradient", 3))

    def test_unknown_op_raises(self, img):
        with pytest.raises(ValueError, match="unknown morphology"):
            filters.morphology_ex_u8(img, "sharpen", 3)

    def test_tophat_extracts_small_bright(self, jax_cpu):
        a = np.zeros((32, 32), np.uint8)
        a[10:12, 10:12] = 200  # small bright blob
        a[20:30, 5:30] = 100  # large structure (survives opening)
        th = np.asarray(filters.morphology_ex_u8(a, "tophat", 5))
        assert th[10, 10] == 200 and th[25, 15] == 0


class TestFilter2D:
    def test_dyadic_kernel_exact(self, img):
        k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float64) / 16
        dev = np.asarray(filters.filter2d_u8(img, k))
        assert np.array_equal(dev, golden.filter2d(img, k))

    def test_separable_matches_full(self, img):
        # a rank-1 gaussian-ish kernel goes down the separable path;
        # result must still match the full-correlation oracle
        v = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16
        k = np.outer(v, v)
        dev = np.asarray(filters.filter2d_u8(img, k))
        ora = golden.filter2d(img, k)
        assert np.abs(dev.astype(int) - ora.astype(int)).max() <= 1

    def test_random_float_kernel_tol1(self, img):
        rng = np.random.default_rng(2)
        k = rng.normal(0, 0.1, (5, 3))
        k[2, 1] += 1.0
        dev = np.asarray(filters.filter2d_u8(img, k))
        ora = golden.filter2d(img, k)
        assert np.abs(dev.astype(int) - ora.astype(int)).max() <= 1

    def test_identity_kernel(self, img):
        k = np.zeros((3, 3))
        k[1, 1] = 1.0
        assert np.array_equal(np.asarray(filters.filter2d_u8(img, k)), img)

    def test_sharpen_on_bgr(self, jax_cpu):
        rgb = np.random.default_rng(3).integers(0, 256, (24, 32, 3), np.uint8)
        k = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float64)
        dev = np.asarray(filters.filter2d_u8(rgb, k))
        assert np.array_equal(dev, golden.filter2d(rgb, k))

    def test_even_kernel_raises(self, img):
        with pytest.raises(ValueError, match="odd"):
            filters.filter2d_u8(img, np.ones((2, 3)))


class TestIntegral:
    def test_matches_oracle(self, img):
        dev = np.asarray(filters.integral_u8(img)).astype(np.int64)
        assert np.array_equal(dev, golden.integral(img))

    def test_box_sum_property(self, img):
        s = golden.integral(img)
        y0, y1, x0, x1 = 5, 20, 7, 31
        want = img[y0:y1, x0:x1].astype(np.int64).sum()
        assert s[y1, x1] - s[y0, x1] - s[y1, x0] + s[y0, x0] == want

    def test_channel_input_raises(self, jax_cpu):
        with pytest.raises(ValueError, match="single-channel"):
            filters.integral_u8(np.zeros((8, 8, 3), np.uint8))


class TestFacades:
    def test_all_three(self, jax_cpu, img):
        import jax.numpy as jnp

        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        mh = Mat.from_array(img)
        md = Mat.from_device(jnp.asarray(img))
        def _2d(a):
            return a[..., 0] if a.ndim == 3 else a

        for m in (mh, md):
            g = imgproc.morphology_ex(m, "close", 3)
            assert np.array_equal(_2d(g.to_numpy()), golden.morphology_ex(img, "close", 3))
            k = np.full((3, 3), 1 / 8.0)
            f = imgproc.filter2d(m, k)
            assert np.abs(_2d(f.to_numpy()).astype(int)
                          - golden.filter2d(img, k).astype(int)).max() <= 1
            s = imgproc.integral(m)
            assert np.array_equal(np.asarray(s), golden.integral(img))


class TestPyrUp:
    def test_exact_gray_and_bgr(self, jax_cpu):
        rng = np.random.default_rng(5)
        for shape in [(17, 23), (12, 16, 3)]:
            img = rng.integers(0, 256, shape, np.uint8)
            dev = np.asarray(filters.pyr_up(img))
            assert dev.shape[:2] == (shape[0] * 2, shape[1] * 2)
            assert np.array_equal(dev, golden.pyr_up(img))

    def test_constant_preserved(self, jax_cpu):
        img = np.full((8, 8), 137, np.uint8)
        up = np.asarray(filters.pyr_up(img))
        assert (up == 137).all()  # x4 gain restores DC exactly

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = np.random.default_rng(6).integers(0, 256, (10, 12), np.uint8)
        out = imgproc.pyr_up(Mat.from_array(img))
        got = out.to_numpy()
        got = got[..., 0] if got.ndim == 3 else got
        assert np.array_equal(got, golden.pyr_up(img))


class TestGenericSobel:
    def test_kernels_match_opencv_construction(self):
        from rustcv_tpu.ops import filters as F

        kx, ky = F.deriv_kernels(1, 0, 3)
        assert kx.tolist() == [-1, 0, 1] and ky.tolist() == [1, 2, 1]
        kx, _ = F.deriv_kernels(2, 0, 3)
        assert kx.tolist() == [1, -2, 1]
        kx, ky = F.deriv_kernels(1, 0, 5)
        assert kx.tolist() == [-1, -2, 0, 2, 1]
        assert ky.tolist() == [1, 4, 6, 4, 1]

    def test_ramp_derivatives(self):
        from rustcv_tpu.ops import filters as F

        ys, xs = np.mgrid[0:10, 0:14]
        dx = F.sobel_xy_numpy((2 * xs).astype(np.uint8), 1, 0, 3)
        assert set(np.unique(dx[:, 2:-2])) == {16}  # 2·2 × smooth-sum 4
        dy = F.sobel_xy_numpy((3 * ys).astype(np.uint8), 0, 1, 3)
        assert set(np.unique(dy[2:-2, :])) == {24}

    def test_device_exact_all_orders(self, jax_cpu):
        from rustcv_tpu.ops import filters as F

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (32, 40)).astype(np.uint8)
        for dx, dy, k in [(1, 0, 3), (0, 1, 3), (1, 1, 3), (2, 0, 3),
                          (1, 0, 5), (0, 2, 5), (1, 0, 7)]:
            g = F.sobel_xy_numpy(img, dx, dy, k)
            d = np.asarray(F.sobel_xy(img, dx, dy, k))
            np.testing.assert_array_equal(g, d)

    def test_facade_and_variable_gaussian(self, jax_cpu):
        from rustcv_tpu.core.mat import Mat
        from rustcv_tpu.imgproc import gaussian_blur, sobel

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 40, 1)).astype(np.uint8)
        out = sobel(Mat.from_array(img), 1, 0, 3)
        assert out.dtype == np.int32 and out.shape == (32, 40)
        b = gaussian_blur(Mat.from_array(img), ksize=9, sigma=2.0)
        assert b.to_numpy().shape == img.shape
        # bigger blur smooths more than the default 5x5
        b5 = gaussian_blur(Mat.from_array(img))
        assert b.to_numpy().astype(float).std() < \
            b5.to_numpy().astype(float).std()

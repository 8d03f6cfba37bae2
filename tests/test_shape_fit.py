"""fitLine / fitEllipse / structuring elements / sepFilter2D /
getGaussianKernel."""

import numpy as np
import pytest

from rustcv_tpu.ops import filters, golden, shape


class TestFitLine:
    def test_exact_line(self):
        t = np.linspace(0, 10, 20)
        pts = np.stack([3 + 2 * t, 1 - t], axis=-1)
        vx, vy, x0, y0 = shape.fit_line(pts)
        d = np.array([vx, vy])
        true = np.array([2, -1]) / np.sqrt(5)
        assert abs(abs(d @ true) - 1) < 1e-12
        # centroid lies on the fit
        assert abs((np.array([x0, y0]) - pts.mean(0)) @ np.array([-vy, vx])) < 1e-9

    def test_noisy_line(self):
        rng = np.random.default_rng(0)
        t = rng.uniform(0, 50, 200)
        pts = np.stack([t, 0.5 * t + 7], axis=-1) + rng.normal(0, 0.3, (200, 2))
        vx, vy, *_ = shape.fit_line(pts)
        slope = vy / vx
        assert abs(slope - 0.5) < 0.02

    def test_vertical_line_sign_convention(self):
        pts = np.stack([np.full(10, 4.0), np.arange(10.0)], axis=-1)
        vx, vy, x0, _ = shape.fit_line(pts)
        assert abs(vx) < 1e-12 and vy > 0 and abs(x0 - 4) < 1e-12

    def test_too_few_raises(self):
        with pytest.raises(ValueError):
            shape.fit_line(np.zeros((1, 2)))


class TestFitEllipse:
    def _ellipse_pts(self, cx, cy, a, b, deg, n=40, noise=0.0, seed=1):
        rng = np.random.default_rng(seed)
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        r = np.radians(deg)
        x = a * np.cos(th)
        y = b * np.sin(th)
        pts = np.stack([
            cx + x * np.cos(r) - y * np.sin(r),
            cy + x * np.sin(r) + y * np.cos(r),
        ], axis=-1)
        return pts + rng.normal(0, noise, pts.shape)

    def test_exact_recovery(self):
        (cx, cy), (w, h), ang = shape.fit_ellipse(
            self._ellipse_pts(50, 40, 20, 10, 30))
        assert abs(cx - 50) < 1e-6 and abs(cy - 40) < 1e-6
        assert abs(w - 40) < 1e-5 and abs(h - 20) < 1e-5  # (major, minor)
        assert abs(ang - 30) < 1e-4  # major-axis angle

    def test_noisy_recovery(self):
        (cx, cy), (w, h), ang = shape.fit_ellipse(
            self._ellipse_pts(50, 40, 20, 10, 75, n=120, noise=0.15))
        assert abs(cx - 50) < 0.3 and abs(cy - 40) < 0.3
        assert abs(max(w, h) - 40) < 1.0

    def test_circle(self):
        (cx, cy), (w, h), _ = shape.fit_ellipse(self._ellipse_pts(5, 5, 8, 8, 0))
        assert abs(w - 16) < 1e-5 and abs(h - 16) < 1e-5

    def test_degenerate_raises(self):
        line = np.stack([np.arange(8.0), np.arange(8.0)], axis=-1)
        with pytest.raises(ValueError):
            shape.fit_ellipse(line)
        with pytest.raises(ValueError):
            shape.fit_ellipse(np.zeros((3, 2)))


class TestStructuringElements:
    def test_shapes(self, jax_cpu):
        r = filters.get_structuring_element("rect", 5)
        assert r.all() and r.shape == (5, 5)
        c = filters.get_structuring_element("cross", 5)
        assert c.sum() == 9 and c[2].all() and c[:, 2].all()
        e = filters.get_structuring_element("ellipse", 7)
        assert e[3].all()  # full middle row
        assert not e[0, 0] and not e[0, -1]  # corners cut
        with pytest.raises(ValueError):
            filters.get_structuring_element("rect", 4)
        with pytest.raises(ValueError):
            filters.get_structuring_element("diamond", 5)

    def test_masked_morphology_exact(self, jax_cpu):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (24, 30), np.uint8)
        for shape_name in ("cross", "ellipse"):
            k = filters.get_structuring_element(shape_name, 5)
            for dev_fn, gold_fn in ((filters.erode_kernel_u8, golden.erode_kernel),
                                    (filters.dilate_kernel_u8, golden.dilate_kernel)):
                assert np.array_equal(np.asarray(dev_fn(img, k)), gold_fn(img, k))

    def test_rect_kernel_matches_square_ops(self, jax_cpu):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (16, 20), np.uint8)
        k = filters.get_structuring_element("rect", 3)
        assert np.array_equal(np.asarray(filters.erode_kernel_u8(img, k)),
                              np.asarray(filters.erode_u8(img, 3)))


class TestSepFilter:
    def test_gaussian_kernel_normalized(self, jax_cpu):
        from rustcv_tpu import imgproc

        k = imgproc.get_gaussian_kernel(7)
        assert abs(k.sum() - 1) < 1e-12 and k[3] == k.max()
        k2 = imgproc.get_gaussian_kernel(5, 1.5)
        assert len(k2) == 5

    def test_sep_filter_matches_filter2d(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (20, 24), np.uint8)
        kx = imgproc.get_gaussian_kernel(5)
        ky = imgproc.get_gaussian_kernel(3)
        out = imgproc.sep_filter_2d(Mat.from_array(img), kx, ky)
        want = golden.filter2d(img, np.outer(ky, kx))
        got = out.to_numpy()
        got = got[..., 0] if got.ndim == 3 else got
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

"""findHomography (RANSAC DLT) + solvePnP (DLT + Gauss-Newton)."""

import numpy as np
import pytest

from rustcv_tpu.ops import calib, geometry

K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])


def _apply_h(H, p):
    q = np.hstack([p, np.ones((len(p), 1))]) @ H.T
    return q[:, :2] / q[:, 2:]


class TestFindHomography:
    def _pts(self, seed, n=40):
        rng = np.random.default_rng(seed)
        src = rng.uniform(0, 200, (n, 2))
        H = np.array([[1.1, 0.08, 12.0], [-0.05, 0.95, -7.0],
                      [2e-4, -1e-4, 1.0]])
        return src, _apply_h(H, src), H

    def test_exact_recovery(self):
        src, dst, H = self._pts(0)
        est, mask = geometry.find_homography(src, dst)
        assert est is not None and mask.all()
        np.testing.assert_allclose(_apply_h(est, src), dst, atol=1e-6)

    def test_robust_to_outliers(self):
        src, dst, H = self._pts(1)
        bad = dst.copy()
        bad[::4] += np.random.default_rng(2).uniform(30, 80, (len(bad[::4]), 2))
        est, mask = geometry.find_homography(src, bad)
        assert est is not None
        assert mask.sum() >= len(src) * 0.7
        inl = mask.nonzero()[0]
        np.testing.assert_allclose(_apply_h(est, src[inl]), bad[inl], atol=1.0)

    def test_deterministic(self):
        src, dst, _ = self._pts(3)
        h1, m1 = geometry.find_homography(src, dst, seed=5)
        h2, m2 = geometry.find_homography(src, dst, seed=5)
        np.testing.assert_array_equal(h1, h2)

    def test_too_few_points(self):
        h, m = geometry.find_homography(np.zeros((3, 2)), np.zeros((3, 2)))
        assert h is None and not m.any()


class TestSolvePnP:
    def _scene(self, seed, dist=(0, 0, 0, 0, 0)):
        rng = np.random.default_rng(seed)
        obj = np.column_stack([
            rng.uniform(-0.5, 0.5, 24), rng.uniform(-0.4, 0.4, 24),
            rng.uniform(-0.2, 0.2, 24),
        ])
        rvec = np.array([0.2, -0.3, 0.1])
        tvec = np.array([0.05, -0.1, 2.5])
        img = calib.project_points(obj, rvec, tvec, K, dist)
        return obj, img, rvec, tvec

    def test_recovers_pose(self):
        obj, img, rvec, tvec = self._scene(0)
        r, t = calib.solve_pnp(obj, img, K)
        np.testing.assert_allclose(r, rvec, atol=1e-8)
        np.testing.assert_allclose(t, tvec, atol=1e-8)

    def test_with_distortion(self):
        dist = (-0.2, 0.05, 0.001, -0.001, 0.0)
        obj, img, rvec, tvec = self._scene(1, dist)
        r, t = calib.solve_pnp(obj, img, K, dist)
        np.testing.assert_allclose(r, rvec, atol=1e-6)
        np.testing.assert_allclose(t, tvec, atol=1e-6)

    def test_noisy_pose(self):
        obj, img, rvec, tvec = self._scene(2)
        img = img + np.random.default_rng(3).normal(0, 0.3, img.shape)
        r, t = calib.solve_pnp(obj, img, K)
        assert np.linalg.norm(r - rvec) < 0.02
        assert np.linalg.norm(t - tvec) < 0.02

    def test_reprojection_drops(self):
        obj, img, *_ = self._scene(4)
        r, t = calib.solve_pnp(obj, img, K)
        reproj = calib.project_points(obj, r, t, K)
        assert np.abs(reproj - img).max() < 1e-6

    def test_too_few_raises(self):
        with pytest.raises(ValueError, match=">= 4"):
            calib.solve_pnp(np.zeros((3, 3)), np.zeros((3, 2)), K)
        # 5 non-coplanar points: below the DLT minimum
        rng = np.random.default_rng(0)
        obj = rng.uniform(-1, 1, (5, 3))
        with pytest.raises(ValueError, match=">= 6"):
            calib.solve_pnp(obj, np.zeros((5, 2)), K)


class TestCalibrateCamera:
    def _views(self, n_views=5, dist=(0, 0, 0, 0, 0), noise=0.0, seed=0):
        rng = np.random.default_rng(seed)
        gx, gy = np.meshgrid(np.arange(7) * 0.03, np.arange(5) * 0.03)
        obj = np.column_stack([gx.ravel(), gy.ravel(), np.zeros(35)])
        objs, imgs, rts = [], [], []
        for _ in range(n_views):
            rvec = rng.uniform(-0.35, 0.35, 3)
            tvec = np.array([rng.uniform(-0.06, 0.06), rng.uniform(-0.05, 0.05),
                             rng.uniform(0.4, 0.7)])
            pix = calib.project_points(obj, rvec, tvec, K, dist)
            if noise:
                pix = pix + rng.normal(0, noise, pix.shape)
            objs.append(obj)
            imgs.append(pix)
            rts.append((rvec, tvec))
        return objs, imgs, rts

    def test_recovers_intrinsics(self):
        objs, imgs, rts = self._views()
        rms, Ke, dist, rvecs, tvecs = calib.calibrate_camera(objs, imgs, (640, 480))
        assert rms < 1e-6
        np.testing.assert_allclose(Ke, K, rtol=1e-6, atol=1e-4)
        assert np.abs(dist).max() < 1e-6
        for (rv, tv), re_, te_ in zip(rts, rvecs, tvecs):
            np.testing.assert_allclose(re_, rv, atol=1e-6)
            np.testing.assert_allclose(te_, tv, atol=1e-6)

    def test_recovers_distortion(self):
        dist = (-0.22, 0.06, 0.0008, -0.0012, 0.0)
        objs, imgs, _ = self._views(6, dist, seed=1)
        rms, Ke, de, *_ = calib.calibrate_camera(objs, imgs, (640, 480))
        assert rms < 1e-5
        np.testing.assert_allclose(Ke, K, rtol=1e-4, atol=0.05)
        np.testing.assert_allclose(de, dist, atol=1e-4)

    def test_noisy_views(self):
        objs, imgs, _ = self._views(8, noise=0.2, seed=2)
        rms, Ke, *_ = calib.calibrate_camera(objs, imgs, (640, 480))
        assert rms < 0.4
        assert abs(Ke[0, 0] - K[0, 0]) / K[0, 0] < 0.02
        assert abs(Ke[0, 2] - K[0, 2]) < 5.0

    def test_validation(self):
        objs, imgs, _ = self._views(2)
        with pytest.raises(ValueError, match=">= 3 views"):
            calib.calibrate_camera(objs, imgs, (640, 480))
        bad = [np.column_stack([o[:, :2], np.ones(len(o))]) for o in objs] + [objs[0]]
        with pytest.raises(ValueError, match="Z == 0"):
            calib.calibrate_camera(bad, imgs + [imgs[0]], (640, 480))

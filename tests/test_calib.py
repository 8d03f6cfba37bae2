"""Camera model — projection round trips, undistortion straightens
lines, rectify maps, optimal new camera matrix coverage properties."""

import numpy as np
import pytest

from rustcv_tpu.ops import calib

K = np.array([[300.0, 0.0, 160.0], [0.0, 300.0, 120.0], [0.0, 0.0, 1.0]])
DIST = (-0.25, 0.08, 0.001, -0.002, 0.0)  # mild barrel + slight tangential


class TestRodrigues:
    def test_round_trip(self):
        r = np.array([0.2, -0.5, 0.35])
        R = calib.rodrigues(r)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert abs(np.linalg.det(R) - 1) < 1e-12
        np.testing.assert_allclose(calib.rodrigues(R), r, atol=1e-10)

    def test_zero_vector(self):
        assert np.allclose(calib.rodrigues(np.zeros(3)), np.eye(3))
        assert np.allclose(calib.rodrigues(np.eye(3)), np.zeros(3))


class TestProjection:
    def test_pinhole_no_distortion(self):
        pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.2, 2.0]])
        uv = calib.project_points(pts, np.zeros(3), np.zeros(3), K)
        np.testing.assert_allclose(uv[0], [160.0, 120.0], atol=1e-12)
        np.testing.assert_allclose(uv[1], [160 + 300 * 0.05, 120 - 300 * 0.1])

    def test_undistort_points_round_trip(self):
        rng = np.random.default_rng(0)
        pts3 = np.stack([rng.uniform(-0.4, 0.4, 50), rng.uniform(-0.3, 0.3, 50),
                         np.full(50, 2.0)], axis=-1)
        ideal = calib.project_points(pts3, np.zeros(3), np.zeros(3), K)
        distorted = calib.project_points(pts3, np.zeros(3), np.zeros(3), K, DIST)
        undone = calib.undistort_points(distorted, K, DIST)
        np.testing.assert_allclose(undone, ideal, atol=1e-6)

    def test_rotation_translation(self):
        p = np.array([[0.0, 0.0, 2.0]])
        uv = calib.project_points(p, np.array([0.0, np.pi / 2, 0.0]),
                                  np.array([0.0, 0.0, 2.0]), K)
        # 90 deg about y: (0,0,2) -> (2,0,0), +t -> (2,0,2) -> x/z=1
        np.testing.assert_allclose(uv[0], [160 + 300, 120], atol=1e-9)


class TestUndistortImage:
    def _grid_image(self, h, w, step=24):
        img = np.full((h, w), 255, np.uint8)
        img[::step, :] = 0
        img[:, ::step] = 0
        return img

    def test_identity_when_no_distortion(self, jax_cpu):
        img = self._grid_image(120, 160)
        out = np.asarray(calib.undistort(img, K, (0, 0, 0, 0, 0)))
        assert np.array_equal(out, img)

    def test_straightens_distorted_grid(self, jax_cpu):
        """Render a grid through the distortion model, undistort, and
        verify a horizontal grid line is straight again (same row across
        the width)."""
        h, w = 240, 320
        Kk = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1]])
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        und = calib.undistort_points(np.stack([xs.ravel(), ys.ravel()], -1), Kk, DIST)
        # distorted image: sample the ideal grid at the undistorted coords
        gx = und[:, 0].reshape(h, w)
        gy = und[:, 1].reshape(h, w)
        ideal = self._grid_image(h, w, 40).astype(np.float64)
        xi = np.clip(np.round(gx).astype(int), 0, w - 1)
        yi = np.clip(np.round(gy).astype(int), 0, h - 1)
        distorted = ideal[yi, xi].astype(np.uint8)
        restored = np.asarray(calib.undistort(distorted, Kk, DIST))
        # straightness: each grid line's dark pixels re-concentrate into
        # its own single row (edges may be lost to invalid source areas,
        # so compare against the neighborhood, not the full width)
        cols = np.array([c for c in range(40, w - 40)
                         if min(c % 40, 40 - c % 40) > 4])  # skip vertical lines
        col_dark = (restored[:, cols] < 64).sum(axis=1)
        for row in (80, 120):
            near = col_dark[row - 6 : row + 7].sum()
            assert col_dark[row] > 50, f"line at row {row} lost"
            assert col_dark[row] > 0.8 * near, f"line at row {row} smeared"

    def test_rectify_map_matches_undistort_points(self):
        mx, my = calib.init_undistort_rectify_map(K, DIST, None, (64, 48))
        # the map at output pixel (u, v) must be the DISTORTED position of
        # the ideal pixel: distort(normalized(u, v))
        uv = np.array([[10.0, 7.0], [40.0, 30.0]])
        x = (uv[:, 0] - K[0, 2]) / K[0, 0]
        y = (uv[:, 1] - K[1, 2]) / K[1, 1]
        xd, yd = calib._distort(x, y, DIST)
        want_x = K[0, 0] * xd + K[0, 2]
        want_y = K[1, 1] * yd + K[1, 2]
        for i, (u, v) in enumerate(uv.astype(int)):
            assert abs(mx[v, u] - want_x[i]) < 1e-4
            assert abs(my[v, u] - want_y[i]) < 1e-4

    def test_optimal_new_camera_matrix(self):
        w, h = 320, 240
        nk0 = calib.get_optimal_new_camera_matrix(K, DIST, (w, h), alpha=0.0)
        nk1 = calib.get_optimal_new_camera_matrix(K, DIST, (w, h), alpha=1.0)
        # alpha=1 keeps everything -> wider view -> smaller focal
        assert nk1[0, 0] < nk0[0, 0]
        # alpha=1: ALL undistorted border points land inside the output
        edge = [(x, y) for x in np.linspace(0, w - 1, 9)
                for y in (0, h - 1)] + [(x, y) for y in np.linspace(0, h - 1, 9)
                                        for x in (0, w - 1)]
        up = calib.undistort_points(np.asarray(edge), K, DIST, new_K=nk1)
        assert up[:, 0].min() > -1.0 and up[:, 0].max() < w + 1.0
        assert up[:, 1].min() > -1.0 and up[:, 1].max() < h + 1.0

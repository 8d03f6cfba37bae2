"""findChessboardCorners: synthetic rendered boards with exact ground
truth, canonical-ordering contract, rejection cases, and the full
calibration loop (render → detect → calibrate_camera recovers K)."""

import numpy as np
import pytest

from rustcv_tpu.ops import calib
from rustcv_tpu.ops.chessboard import find_chessboard_corners

COLS_SQ, ROWS_SQ = 10, 7          # squares
PATTERN = (COLS_SQ - 1, ROWS_SQ - 1)  # inner corners (cols, rows)


def render_board(h_img, w_img, hmat, noise=0.0, seed=0,
                 cols_sq=COLS_SQ, rows_sq=ROWS_SQ):
    """Chessboard under homography ``hmat`` (board units → px) with the
    exact inner-corner ground truth grid (rows, cols, 2)."""
    ys, xs = np.mgrid[0:h_img, 0:w_img].astype(np.float64)
    hin = np.linalg.inv(hmat)
    w = hin[2, 0] * xs + hin[2, 1] * ys + hin[2, 2]
    bx = (hin[0, 0] * xs + hin[0, 1] * ys + hin[0, 2]) / w
    by = (hin[1, 0] * xs + hin[1, 1] * ys + hin[1, 2]) / w
    inside = (bx >= 0) & (bx < cols_sq) & (by >= 0) & (by < rows_sq)
    black = ((np.floor(bx).astype(int) + np.floor(by).astype(int)) % 2
             == 0) & inside
    img = np.full((h_img, w_img), 200.0)
    img[black] = 40.0
    rng = np.random.default_rng(seed)
    if noise:
        img += rng.normal(0, noise, img.shape)
    for _ in range(2):  # mild blur for realistic edges
        p = np.pad(img, 1, mode="edge")
        img = sum(p[dy:dy + h_img, dx:dx + w_img]
                  for dy in range(3) for dx in range(3)) / 9.0
    img = np.clip(img, 0, 255).astype(np.uint8)
    gx, gy = np.meshgrid(np.arange(1, cols_sq), np.arange(1, rows_sq))
    pts = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], 1) @ hmat.T
    pts = pts[:, :2] / pts[:, 2:]
    return img, pts.reshape(rows_sq - 1, cols_sq - 1, 2)


def grid_error(corners, true_grid):
    """Max corner error against the truth grid up to flips (the detector
    cannot know board orientation)."""
    rows, cols = true_grid.shape[:2]
    cg = corners.reshape(rows, cols, 2)
    flips = (true_grid, true_grid[::-1, ::-1], true_grid[::-1, :],
             true_grid[:, ::-1])
    return min(np.linalg.norm(cg - g, axis=2).max() for g in flips)


def _h(theta, scale, tx, ty, px=0.0, py=0.0):
    return np.array([
        [scale * np.cos(theta), -scale * np.sin(theta), tx],
        [scale * np.sin(theta), scale * np.cos(theta), ty],
        [px, py, 1.0],
    ])


class TestDetection:
    def test_fronto_parallel(self):
        img, truth = render_board(400, 500, _h(0.0, 40, 60, 50), noise=2.0)
        found, corners = find_chessboard_corners(img, PATTERN)
        assert found and len(corners) == PATTERN[0] * PATTERN[1]
        assert grid_error(corners, truth) < 0.8

    def test_rotated_with_perspective(self):
        hm = _h(0.12, 38, 60, 50, 1e-4, -6e-5)
        img, truth = render_board(420, 520, hm, noise=3.0)
        found, corners = find_chessboard_corners(img, PATTERN)
        assert found
        assert grid_error(corners, truth) < 0.8

    def test_rotated_90(self):
        hm = _h(np.pi / 2, 36, 300, 40)
        img, truth = render_board(420, 340, hm, noise=2.0)
        found, corners = find_chessboard_corners(img, PATTERN)
        assert found
        # 90°-rotated board: the lattice axes are intrinsic (6 ≠ 9), so
        # the detection still aligns with a flip of the SAME truth grid
        assert grid_error(corners, truth) < 1.0

    def test_unrefined_still_close(self):
        img, truth = render_board(400, 500, _h(0.05, 40, 60, 50))
        found, corners = find_chessboard_corners(img, PATTERN,
                                                 refine=False)
        assert found
        assert grid_error(corners, truth) < 2.0


class TestOrderingContract:
    def test_row_major_canonical(self):
        img, _ = render_board(400, 500, _h(0.05, 40, 60, 50), noise=1.0)
        found, corners = find_chessboard_corners(img, PATTERN)
        assert found
        cols, rows = PATTERN
        grid = corners.reshape(rows, cols, 2)
        # corner (0,0) is the min-(x+y) grid corner
        corners4 = [grid[0, 0], grid[0, -1], grid[-1, 0], grid[-1, -1]]
        assert np.argmin([c.sum() for c in corners4]) == 0
        # row 0 runs left→right, columns top→bottom
        assert (np.diff(grid[0, :, 0]) > 0).all()
        assert (np.diff(grid[:, 0, 1]) > 0).all()

    def test_deterministic(self):
        img, _ = render_board(400, 500, _h(0.08, 40, 55, 45), noise=2.0,
                              seed=3)
        r1 = find_chessboard_corners(img, PATTERN)
        r2 = find_chessboard_corners(img, PATTERN)
        assert r1[0] == r2[0]
        np.testing.assert_array_equal(r1[1], r2[1])


class TestRejection:
    def test_blank_image(self):
        found, corners = find_chessboard_corners(
            np.full((200, 200), 128, np.uint8), PATTERN)
        assert not found and corners.shape == (0, 2)

    def test_noise_image(self):
        rng = np.random.default_rng(0)
        found, _ = find_chessboard_corners(
            rng.integers(0, 256, (200, 200)).astype(np.uint8), PATTERN)
        assert not found

    def test_wrong_pattern_size(self):
        img, _ = render_board(400, 500, _h(0.0, 40, 60, 50))
        found, _ = find_chessboard_corners(img, (7, 5))
        assert not found

    def test_bad_args(self):
        with pytest.raises(ValueError):
            find_chessboard_corners(np.zeros((50, 50, 3), np.uint8),
                                    PATTERN)
        with pytest.raises(ValueError):
            find_chessboard_corners(np.zeros((50, 50), np.uint8), (1, 5))


class TestCalibrationLoop:
    def test_detect_then_calibrate_recovers_k(self):
        """The flagship loop: render views with a known camera, detect
        with find_chessboard_corners, calibrate with calibrate_camera."""
        k_true = np.array([[600.0, 0, 330], [0, 590.0, 245], [0, 0, 1]])
        size = 0.03  # 3 cm squares
        board_obj = np.stack(
            np.meshgrid(np.arange(1, COLS_SQ) * size,
                        np.arange(1, ROWS_SQ) * size), -1,
        ).reshape(-1, 2)
        board_obj = np.concatenate(
            [board_obj, np.zeros((len(board_obj), 1))], 1)
        views_obj, views_img = [], []
        rng = np.random.default_rng(7)
        n_found = 0
        for v in range(5):
            rv = rng.uniform(-0.25, 0.25, 3)
            tv = np.array([rng.uniform(-0.03, 0.03) - size * COLS_SQ / 2,
                           rng.uniform(-0.03, 0.03) - size * ROWS_SQ / 2,
                           rng.uniform(0.55, 0.8)])
            rm = calib.rodrigues(rv)
            # homography board units → pixels (column scale = square size)
            hm = k_true @ np.column_stack(
                [rm[:, 0] * size, rm[:, 1] * size, tv])
            img, truth = render_board(480, 640, hm, noise=2.0, seed=v)
            found, corners = find_chessboard_corners(img, PATTERN)
            if not found:
                continue
            n_found += 1
            # align detection to the truth traversal (the detector's
            # canonical frame may be a flip of the object grid)
            cols, rows = PATTERN
            cg = corners.reshape(rows, cols, 2)
            tg = truth
            flips = (lambda a: a, lambda a: a[::-1, ::-1],
                     lambda a: a[::-1, :], lambda a: a[:, ::-1])
            best = min(((np.linalg.norm(cg - f(tg), axis=2).max(), f)
                        for f in flips), key=lambda e: e[0])
            assert best[0] < 1.0
            # flips are involutions: if cg ≈ f(truth), f(cg) ≈ truth —
            # aligning the detection to the object-point traversal
            views_obj.append(board_obj)
            views_img.append(best[1](cg).reshape(-1, 2))
        assert n_found >= 4
        rms, k_est, dist, _, _ = calib.calibrate_camera(
            views_obj, views_img, (640, 480))
        assert rms < 1.0
        assert abs(k_est[0, 0] - k_true[0, 0]) / k_true[0, 0] < 0.03
        assert abs(k_est[1, 1] - k_true[1, 1]) / k_true[1, 1] < 0.03
        assert abs(k_est[0, 2] - k_true[0, 2]) < 15
        assert abs(k_est[1, 2] - k_true[1, 2]) < 15


class TestFacade:
    def test_mat_bgr_input_and_draw(self):
        from rustcv_tpu import imgproc as ip
        from rustcv_tpu.core import Mat

        img, _ = render_board(400, 500, _h(0.05, 40, 60, 50), noise=1.0)
        bgr = np.repeat(img[:, :, None], 3, axis=2)
        mat = Mat.from_array(bgr.copy())  # Mat may share the buffer
        found, corners = ip.find_chessboard_corners(mat, PATTERN)
        assert found
        ip.draw_chessboard_corners(mat, PATTERN, corners, found)
        out = mat.to_numpy()
        assert (out != bgr).any()  # something was drawn


class TestSharpness:
    """estimateChessboardSharpness role."""

    @staticmethod
    def _board(blur_sigma):
        import cv2 as _cv2

        img = np.full((300, 380), 220, np.uint8)
        sq = 30
        for r in range(8):
            for c in range(10):
                v = 220 if (r + c) % 2 == 0 else 35
                img[30 + r * sq:30 + (r + 1) * sq,
                    40 + c * sq:40 + (c + 1) * sq] = v
        if blur_sigma > 0:
            k = int(blur_sigma * 6) | 1
            img = _cv2.GaussianBlur(img, (k, k), blur_sigma)
        return img

    def test_blur_increases_width(self):
        from rustcv_tpu.ops.chessboard import (
            estimate_chessboard_sharpness,
            find_chessboard_corners,
        )

        vals = []
        for sigma in (0.6, 2.0):
            img = self._board(sigma)
            found, corners = find_chessboard_corners(img, (9, 7))
            assert found
            s, lo, hi = estimate_chessboard_sharpness(img, (9, 7),
                                                      corners)
            assert hi > lo
            vals.append(s)
        assert vals[1] > 1.3 * vals[0], vals

    def test_vs_cv2(self):
        cv2 = pytest.importorskip("cv2")
        from rustcv_tpu.ops.chessboard import (
            estimate_chessboard_sharpness,
            find_chessboard_corners,
        )

        img = self._board(1.2)
        found, corners = find_chessboard_corners(img, (9, 7))
        assert found
        ours = estimate_chessboard_sharpness(img, (9, 7), corners)[0]
        ref = cv2.estimateChessboardSharpness(
            img, (9, 7), corners.reshape(-1, 1, 2).astype(np.float32))
        ref_s = float(np.asarray(ref[0]).ravel()[0])
        assert 0.5 * ref_s <= ours <= 2.0 * ref_s, (ours, ref_s)

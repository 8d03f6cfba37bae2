"""findChessboardCornersSB (sector-based detector, ops/chessboard_sb.py):
device-twin exactness of the likelihood field, detection under
perspective/rotation/blur, the cv2 oracle cross-check, ordering and
determinism contracts, and rejection cases."""

import numpy as np
import pytest

from rustcv_tpu.ops.chessboard_sb import (
    _likelihood,
    _likelihood_numpy,
    find_chessboard_corners_sb,
)
from test_chessboard import PATTERN, _h, grid_error, render_board


class TestLikelihoodTwin:
    def test_device_matches_numpy_oracle(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (48, 64))
        dev = np.asarray(_likelihood(jnp.asarray(img, jnp.float32)))
        orc = _likelihood_numpy(img)
        assert np.abs(dev - orc).max() < 1e-5

    def test_peaks_at_corners(self):
        """The likelihood's global peak lands on a checker corner."""
        import jax.numpy as jnp

        img, truth = render_board(200, 260, _h(0.0, 30, 40, 30))
        like = np.asarray(
            _likelihood(jnp.asarray(img / 255.0, jnp.float32)))
        py, px = np.unravel_index(like.argmax(), like.shape)
        d = np.linalg.norm(truth.reshape(-1, 2) - [px, py], axis=1)
        assert d.min() < 2.0


class TestDetection:
    def test_fronto_parallel(self):
        img, truth = render_board(400, 500, _h(0.0, 40, 60, 50), noise=2.0)
        found, corners = find_chessboard_corners_sb(img, PATTERN)
        assert found and len(corners) == PATTERN[0] * PATTERN[1]
        assert grid_error(corners, truth) < 1.0

    def test_rotated_with_perspective(self):
        hm = _h(0.12, 38, 60, 50, 1e-4, -6e-5)
        img, truth = render_board(420, 520, hm, noise=3.0)
        found, corners = find_chessboard_corners_sb(img, PATTERN)
        assert found
        assert grid_error(corners, truth) < 1.0

    def test_rotated_90(self):
        hm = _h(np.pi / 2, 36, 300, 40)
        img, truth = render_board(420, 340, hm, noise=2.0)
        found, corners = find_chessboard_corners_sb(img, PATTERN)
        assert found
        assert grid_error(corners, truth) < 1.0

    def test_strong_blur(self):
        """SB's raison d'être: no binarization stage, so heavy defocus
        that breaks quad splitting still detects."""
        cv2 = pytest.importorskip("cv2")
        hm = _h(0.12, 38, 60, 50, 1e-4, -6e-5)
        img, truth = render_board(420, 520, hm, noise=3.0)
        blurred = cv2.GaussianBlur(img, (11, 11), 3.0)
        found, corners = find_chessboard_corners_sb(blurred, PATTERN)
        assert found
        assert grid_error(corners, truth) < 1.5

    def test_low_contrast_with_normalize(self):
        img, truth = render_board(400, 500, _h(0.05, 40, 60, 50),
                                  noise=1.0)
        low = (img.astype(np.float64) * 0.12 + 110).astype(np.uint8)
        found, corners = find_chessboard_corners_sb(low, PATTERN,
                                                    normalize=True)
        assert found
        assert grid_error(corners, truth) < 1.0


class TestVsCv2:
    def test_point_set_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        hm = _h(0.12, 38, 60, 50, 1e-4, -6e-5)
        img, _ = render_board(420, 520, hm, noise=3.0)
        found, ours = find_chessboard_corners_sb(img, PATTERN)
        ok, ref = cv2.findChessboardCornersSB(img, PATTERN)
        assert found and ok
        ref = ref.reshape(-1, 2).astype(np.float64)
        d = np.linalg.norm(ours[:, None, :] - ref[None, :, :], axis=2)
        # same point SET (ordering conventions differ) within 0.5 px
        assert d.min(axis=1).max() < 0.5
        assert d.min(axis=0).max() < 0.5


class TestContracts:
    def test_canonical_order_matches_quad_detector(self):
        from rustcv_tpu.ops.chessboard import find_chessboard_corners

        img, _ = render_board(400, 500, _h(0.05, 40, 60, 50), noise=1.0)
        f1, c1 = find_chessboard_corners(img, PATTERN)
        f2, c2 = find_chessboard_corners_sb(img, PATTERN)
        assert f1 and f2
        # drop-in replacement: same traversal, sub-pixel-close corners
        assert np.linalg.norm(c1 - c2, axis=1).max() < 1.0

    def test_deterministic(self):
        img, _ = render_board(400, 500, _h(0.08, 40, 55, 45), noise=2.0,
                              seed=3)
        r1 = find_chessboard_corners_sb(img, PATTERN)
        r2 = find_chessboard_corners_sb(img, PATTERN)
        assert r1[0] == r2[0]
        np.testing.assert_array_equal(r1[1], r2[1])

    def test_facade_mat_input(self):
        from rustcv_tpu import imgproc as ip
        from rustcv_tpu.core import Mat

        img, _ = render_board(400, 500, _h(0.05, 40, 60, 50), noise=1.0)
        bgr = np.repeat(img[:, :, None], 3, axis=2)
        found, corners = ip.find_chessboard_corners_sb(
            Mat.from_array(bgr.copy()), PATTERN)
        assert found and corners.shape == (PATTERN[0] * PATTERN[1], 2)


class TestRejection:
    def test_blank_image(self):
        found, corners = find_chessboard_corners_sb(
            np.full((200, 200), 128, np.uint8), PATTERN)
        assert not found and corners.shape == (0, 2)

    def test_noise_image(self):
        rng = np.random.default_rng(0)
        found, _ = find_chessboard_corners_sb(
            rng.integers(0, 256, (200, 200)).astype(np.uint8), PATTERN)
        assert not found

    def test_wrong_pattern_size(self):
        img, _ = render_board(400, 500, _h(0.0, 40, 60, 50))
        found, _ = find_chessboard_corners_sb(img, (7, 5))
        assert not found

    def test_bad_args(self):
        with pytest.raises(ValueError):
            find_chessboard_corners_sb(np.zeros((50, 50, 3), np.uint8),
                                       PATTERN)
        with pytest.raises(ValueError):
            find_chessboard_corners_sb(np.zeros((50, 50), np.uint8),
                                       (1, 5))

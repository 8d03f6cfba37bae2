"""ArUco GridBoard and CharucoBoard: render → detect → pose /
charuco-corner interpolation, verified against projected ground truth."""

import numpy as np
import pytest

from rustcv_tpu.ops import aruco, calib


@pytest.fixture(scope="module")
def dic():
    return aruco.Dictionary.generate(24, 4, seed=7)


def _project_board_image(board_img, k, rvec, tvec, scale, out_shape):
    """Warp a planar board image into camera view via its homography
    (object units: pixel/scale)."""
    import cv2

    r = calib.rodrigues(np.asarray(rvec, np.float64))
    h_plane = k @ np.column_stack([r[:, 0], r[:, 1],
                                   np.asarray(tvec, np.float64)])
    # object coords = board pixel * scale
    s = np.diag([scale, scale, 1.0])
    hmat = h_plane @ s
    return cv2.warpPerspective(
        board_img, hmat.astype(np.float64), out_shape[::-1],
        flags=cv2.INTER_LINEAR, borderValue=255)


def test_grid_board_pose(dic):
    cv2 = pytest.importorskip("cv2")
    # separation chosen as an exact cell multiple (the renderer
    # quantizes the gap to whole dictionary cells): 0.02 = 3 cells
    board = aruco.GridBoard((4, 3), 0.04, 0.02, dic)
    img = board.draw(cell_px=10)
    k = np.array([[520.0, 0, 160], [0, 520.0, 120], [0, 0, 1.0]])
    rvec = np.array([0.15, -0.1, 0.05])
    tvec = np.array([-0.1, -0.07, 0.45])
    # board.draw margin = 1 cell → object origin at (cell, cell) px;
    # scale: marker spans (bits+2) cells = marker_length
    cell_m = 0.04 / (dic.bits + 2)
    scale = cell_m / 10.0  # metres per board-image pixel
    # shift so the first marker's top-left is object (0,0); +0.5 maps
    # pixel CENTERS (warpPerspective's convention) onto square edges
    shift = np.array([[1, 0, -10.0 + 0.5], [0, 1, -10.0 + 0.5],
                      [0, 0, 1]])
    r = calib.rodrigues(rvec)
    h_plane = k @ np.column_stack([r[:, 0], r[:, 1], tvec])
    hmat = h_plane @ np.diag([scale, scale, 1.0]) @ shift
    view = cv2.warpPerspective(img, hmat, (320, 240),
                               flags=cv2.INTER_LINEAR, borderValue=255)
    corners, ids = aruco.detect_markers(view, dic)
    assert len(ids) >= 6
    n, rv, tv = aruco.estimate_pose_board(corners, ids, board, k)
    assert n >= 6
    np.testing.assert_allclose(rv, rvec, atol=0.02)
    np.testing.assert_allclose(tv, tvec, atol=0.01)


def test_grid_board_object_corners(dic):
    board = aruco.GridBoard((3, 2), 0.05, 0.01, dic)
    c0 = board.marker_object_corners(0)
    c4 = board.marker_object_corners(4)  # row 1, col 1
    np.testing.assert_allclose(c0[0], [0, 0, 0])
    np.testing.assert_allclose(c0[2], [0.05, 0.05, 0])
    np.testing.assert_allclose(c4[0], [0.06, 0.06, 0])


def test_charuco_interpolation(dic):
    cv2 = pytest.importorskip("cv2")
    board = aruco.CharucoBoard((5, 4), 0.04, 0.03, dic)
    img = board.draw(square_px=40)
    k = np.array([[540.0, 0, 170], [0, 540.0, 130], [0, 0, 1.0]])
    rvec = np.array([0.1, -0.12, 0.03])
    tvec = np.array([-0.09, -0.06, 0.5])
    scale = 0.04 / 40.0
    r = calib.rodrigues(rvec)
    h_plane = k @ np.column_stack([r[:, 0], r[:, 1], tvec])
    shift = np.array([[1, 0, 0.5], [0, 1, 0.5], [0, 0, 1.0]])
    hmat = h_plane @ np.diag([scale, scale, 1.0]) @ shift
    view = cv2.warpPerspective(img, hmat, (340, 260),
                               flags=cv2.INTER_LINEAR, borderValue=255)
    corners, ids = aruco.detect_markers(view, dic)
    assert len(ids) >= 5
    ch_pts, ch_ids = aruco.interpolate_corners_charuco(
        corners, ids, view, board, k)
    assert len(ch_pts) >= 8
    # ground truth: project the inner corners
    obj = board.chessboard_corners()
    truth = calib.project_points(obj, rvec, tvec, k, (0, 0, 0, 0, 0))
    err = np.linalg.norm(ch_pts - truth[ch_ids], axis=1)
    assert np.median(err) < 0.7, np.median(err)


def test_charuco_board_layout(dic):
    board = aruco.CharucoBoard((5, 4), 0.04, 0.03, dic)
    # (5-1)*(4-1) = 12 inner corners
    assert board.chessboard_corners().shape == (12, 3)
    # markers on white squares only: 5*4/2 = 10
    assert len(board.marker_cells) == 10
    img = board.draw(square_px=24)
    assert img.shape == (96, 120)
    # corner square (0,0) is black
    assert img[2, 2] == 0

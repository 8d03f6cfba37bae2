"""ArUco markers: dictionary properties, detection under rotation /
perspective / multiple markers, planar pose recovery."""

import numpy as np
import pytest

from rustcv_tpu.ops import aruco, calib, warp


@pytest.fixture(scope="module")
def dic():
    return aruco.Dictionary.generate(20, 4, seed=7)


class TestDictionary:
    def test_min_distance_holds(self, dic):
        n = len(dic.codes)
        for i in range(n):
            rots = [np.rot90(dic.codes[i], k) for k in range(4)]
            for k in range(1, 4):
                assert (dic.codes[i] ^ rots[k]).sum() >= 4
            for j in range(i + 1, n):
                for r in rots:
                    assert (dic.codes[j] ^ r).sum() >= 4

    def test_match_identity_and_rotations(self, dic):
        for mid in (0, 7, 19):
            for k in range(4):
                got, rot = dic.match(np.rot90(dic.codes[mid], k))
                assert got == mid and rot == k


class TestDetect:
    def test_rotations_canonical_corner(self, dic):
        m = aruco.draw_marker(dic, 5, 8)
        want = {0: (80., 60.), 1: (80., 107.), 2: (127., 107.),
                3: (127., 60.)}
        for k in range(4):
            sc = np.full((200, 260), 200, np.uint8)
            sc[60:108, 80:128] = np.rot90(m, k)
            corners, ids = aruco.detect_markers(sc, dic)
            assert list(ids) == [5]
            assert tuple(corners[0][0]) == want[k]

    def test_multiple_markers(self, dic):
        sc = np.full((240, 320), 190, np.uint8)
        for mid, (y, x) in [(2, (30, 40)), (9, (30, 200)),
                            (17, (150, 120))]:
            sc[y:y + 48, x:x + 48] = aruco.draw_marker(dic, mid, 8)
        corners, ids = aruco.detect_markers(sc, dic)
        assert sorted(ids.tolist()) == [2, 9, 17]

    def test_perspective_warped_marker(self, dic):
        m = aruco.draw_marker(dic, 11, 10)
        canvas = np.full((240, 320), 200, np.uint8)
        srcq = np.array([[0, 0], [59, 0], [59, 59], [0, 59]], np.float64)
        dstq = np.array([[90, 60], [200, 70], [190, 170], [80, 150]],
                        np.float64)
        hmat = warp.get_perspective_transform(srcq, dstq)
        warped = warp.warp_perspective_numpy(
            m[..., None], hmat, (320, 240))[..., 0]
        mask = warp.warp_perspective_numpy(
            np.full_like(m, 255)[..., None], hmat, (320, 240))[..., 0]
        canvas[mask > 128] = warped[mask > 128]
        corners, ids = aruco.detect_markers(canvas, dic)
        assert list(ids) == [11]
        # detected corners near the projected quad corners
        got = corners[0]
        for dq in dstq:
            assert np.min(np.linalg.norm(got - dq, axis=1)) < 3.0

    def test_plain_scene_clean(self, dic):
        rng = np.random.default_rng(2)
        noise = rng.integers(0, 256, (160, 200)).astype(np.uint8)
        corners, ids = aruco.detect_markers(noise, dic)
        assert len(ids) == 0


class TestPose:
    def test_recovers_known_pose(self, dic):
        K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
        L = 0.1
        rvec = np.array([0.1, -0.2, 0.05])
        tvec = np.array([0.02, -0.01, 0.6])
        half = L / 2
        obj = np.array([[-half, -half, 0], [half, -half, 0],
                        [half, half, 0], [-half, half, 0]])
        px = calib.project_points(obj, rvec, tvec, K, (0,) * 5)
        rv, tv = aruco.estimate_pose_single_markers(
            [px.astype(np.float32)], L, K)
        assert np.abs(rv[0] - rvec).max() < 1e-3
        assert np.abs(tv[0] - tvec).max() < 1e-3

"""Calib3d long tail + stereo post-filter vs cv2 5.0."""

import numpy as np
import pytest

from rustcv_tpu.ops import calib_ext as ce

cv2 = pytest.importorskip("cv2")


def test_compose_rt(rng):
    r1 = rng.normal(0, 0.3, 3)
    t1 = rng.normal(0, 2, 3)
    r2 = rng.normal(0, 0.3, 3)
    t2 = rng.normal(0, 2, 3)
    rv, tv = ce.compose_rt(r1, t1, r2, t2)
    ref = cv2.composeRT(r1, t1, r2, t2)
    np.testing.assert_allclose(rv, ref[0].ravel(), atol=1e-9)
    np.testing.assert_allclose(tv, ref[1].ravel(), atol=1e-9)


def test_decompose_projection_matrix(rng):
    k_true = np.array([[620.0, 0, 310], [0, 600.0, 245], [0, 0, 1.0]])
    rv = rng.normal(0, 0.4, 3)
    from rustcv_tpu.ops.calib import rodrigues
    r_true = rodrigues(rv)
    t_true = rng.normal(0, 3, 3)
    p = k_true @ np.concatenate([r_true, t_true[:, None]], 1)
    k, r, c = ce.decompose_projection_matrix(p)
    kr, rr, cr = cv2.decomposeProjectionMatrix(p)[:3]
    np.testing.assert_allclose(k, kr / kr[2, 2], atol=1e-8)
    np.testing.assert_allclose(r, rr, atol=1e-8)
    np.testing.assert_allclose(c / c[3], (cr / cr[3]).ravel(),
                               atol=1e-8)
    np.testing.assert_allclose(k, k_true, atol=1e-7)


def test_calibration_matrix_values():
    k = np.array([[600.0, 0, 320], [0, 590.0, 240], [0, 0, 1.0]])
    ours = ce.calibration_matrix_values(k, (640, 480), 3.6, 2.7)
    ref = cv2.calibrationMatrixValues(k, (640, 480), 3.6, 2.7)
    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-9)
    np.testing.assert_allclose(ours[1], ref[1], rtol=1e-9)
    np.testing.assert_allclose(ours[2], ref[2], rtol=1e-9)
    np.testing.assert_allclose(ours[3], ref[3], rtol=1e-9)
    np.testing.assert_allclose(ours[4], ref[4], rtol=1e-9)


def test_sampson_distance(rng):
    f = rng.normal(0, 1, (3, 3))
    x1 = np.array([*rng.normal(0, 50, 2), 1.0])
    x2 = np.array([*rng.normal(0, 50, 2), 1.0])
    np.testing.assert_allclose(ce.sampson_distance(x1, x2, f),
                               cv2.sampsonDistance(x1, x2, f),
                               rtol=1e-10)


def test_estimate_translation(rng):
    src = rng.normal(0, 20, (40, 2))
    t_true = np.array([3.5, -2.0])
    dst = src + t_true + rng.normal(0, 0.1, src.shape)
    dst[:5] += rng.normal(0, 30, (5, 2))  # outliers
    t, inl = ce.estimate_translation_2d(src, dst)
    np.testing.assert_allclose(t, t_true, atol=0.15)
    assert inl.sum() >= 30


def test_stereo_rectify_uncalibrated(rng):
    # synthetic stereo: points on a plane + pure horizontal baseline
    k = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1.0]])
    pts3 = np.stack([rng.uniform(-1, 1, 60), rng.uniform(-0.7, 0.7, 60),
                     rng.uniform(3, 6, 60)], 1)
    p1 = (pts3 / pts3[:, 2:]) @ k.T
    t = np.array([0.3, 0.05, 0.0])  # slightly off-horizontal baseline
    pts3b = pts3 - t
    p2 = (pts3b / pts3b[:, 2:]) @ k.T
    x1 = p1[:, :2]
    x2 = p2[:, :2]
    f, _ = cv2.findFundamentalMat(x1, x2, cv2.FM_8POINT)
    ok, h1, h2 = ce.stereo_rectify_uncalibrated(x1, x2, f, (320, 240))
    assert ok
    # rectification property: warped correspondences share scanlines
    x1h = np.concatenate([x1, np.ones((60, 1))], 1) @ h1.T
    x2h = np.concatenate([x2, np.ones((60, 1))], 1) @ h2.T
    y1 = x1h[:, 1] / x1h[:, 2]
    y2 = x2h[:, 1] / x2h[:, 2]
    assert np.median(np.abs(y1 - y2)) < 1.0


def test_filter_speckles():
    disp = np.zeros((8, 10), np.int16)
    disp[2:4, 2:4] = 50      # 4-px speckle
    disp[5:8, 5:10] = 30     # 15-px region
    ours = ce.filter_speckles(disp, 0, 5, 2)
    ref = disp.copy()
    cv2.filterSpeckles(ref, 0, 5, 2)
    np.testing.assert_array_equal(ours, ref)
    ours2 = ce.filter_speckles(disp, -1, 20, 2)
    ref2 = disp.copy()
    cv2.filterSpeckles(ref2, -1, 20, 2)
    np.testing.assert_array_equal(ours2, ref2)


def test_flo_round_trip(tmp_path, rng):
    flow = rng.normal(0, 3, (12, 17, 2)).astype(np.float32)
    path = str(tmp_path / "t.flo")
    assert ce.write_optical_flow(path, flow)
    back = ce.read_optical_flow(path)
    np.testing.assert_array_equal(back, flow)
    ref = cv2.readOpticalFlow(path)
    np.testing.assert_array_equal(ref, flow)
    cv2.writeOpticalFlow(str(tmp_path / "c.flo"), flow)
    np.testing.assert_array_equal(
        ce.read_optical_flow(str(tmp_path / "c.flo")), flow)


def test_init_camera_matrix(rng):
    # render synthetic planar views through a known camera, recover K
    from rustcv_tpu.ops import calib
    k_true = np.array([[610.0, 0, 320], [0, 600.0, 240], [0, 0, 1.0]])
    board = np.stack(np.meshgrid(np.arange(9) * 0.03,
                                 np.arange(6) * 0.03), -1).reshape(-1, 2)
    obj = np.concatenate([board, np.zeros((len(board), 1))], 1)
    objs, imgs = [], []
    for v in range(4):
        rvec = rng.uniform(-0.3, 0.3, 3)
        tvec = np.array([-0.12, -0.08, rng.uniform(0.5, 0.8)])
        proj = calib.project_points(obj, rvec, tvec, k_true,
                                    (0, 0, 0, 0, 0))
        objs.append(obj)
        imgs.append(proj)
    k = ce.init_camera_matrix_2d(objs, imgs, (640, 480))
    assert abs(k[0, 0] - 610) / 610 < 0.05
    assert abs(k[1, 1] - 600) / 600 < 0.05


def test_solve_p3p(rng):
    from rustcv_tpu.ops import calib

    k = np.array([[520.0, 0, 320], [0, 510.0, 240], [0, 0, 1.0]])
    obj = np.array([[0.0, 0, 0], [0.12, 0.02, 0], [0.03, 0.1, 0.05]])
    rvec = np.array([0.2, -0.15, 0.1])
    tvec = np.array([-0.05, 0.02, 0.6])
    img = calib.project_points(obj, rvec, tvec, k, (0, 0, 0, 0, 0))
    sols = ce.solve_p3p(obj, img, k)
    assert 1 <= len(sols) <= 4
    # the true pose is among the solutions (best by reprojection)
    rv, tv = sols[0]
    np.testing.assert_allclose(rv, rvec, atol=1e-6)
    np.testing.assert_allclose(tv, tvec, atol=1e-6)
    # cross-check: each of OUR solutions appears in cv2's solution set
    # (all P3P solutions reproject the 3 points exactly — the
    # ambiguity is inherent, so compare as SETS)
    n, rvecs, tvecs = cv2.solveP3P(obj, img.reshape(-1, 1, 2), k,
                                   np.zeros(5), flags=cv2.SOLVEPNP_P3P)
    if n:
        refs = [(rvecs[i].ravel(), tvecs[i].ravel()) for i in range(n)]
        for orv, otv in sols:
            assert any(np.allclose(orv, rr, atol=1e-3)
                       and np.allclose(otv, tt, atol=1e-3)
                       for rr, tt in refs), orv


def test_solve_pnp_refine_and_gftt_quality(rng):
    import rustcv_tpu.imgproc as ip
    from rustcv_tpu.core.mat import Mat
    from rustcv_tpu.ops import calib

    k = np.array([[520.0, 0, 320], [0, 510.0, 240], [0, 0, 1.0]])
    obj = rng.uniform(-0.2, 0.2, (8, 3))
    rvec = np.array([0.1, -0.2, 0.05])
    tvec = np.array([0.02, -0.05, 0.8])
    img = calib.project_points(obj, rvec, tvec, k, (0, 0, 0, 0, 0))
    rv0 = rvec + rng.normal(0, 0.02, 3)
    tv0 = tvec + rng.normal(0, 0.01, 3)
    rv, tv = ip.solve_pnp_refine(obj, img, k, (0, 0, 0, 0, 0), rv0, tv0)
    np.testing.assert_allclose(rv, rvec, atol=1e-8)
    np.testing.assert_allclose(tv, tvec, atol=1e-8)

    gray = np.zeros((64, 96), np.uint8)
    gray[20:44, 30:66] = 200
    pts, quality = ip.good_features_to_track_with_quality(
        Mat.from_array(gray), max_corners=8)
    assert len(pts) == len(quality) > 0
    assert (quality > 0).all()
    # qualities are descending (points are ranked by response)
    assert (np.diff(quality) <= 0).all()


def test_calibrate_camera_extended(rng):
    from rustcv_tpu.ops import calib

    k_true = np.array([[610.0, 0, 320], [0, 600.0, 240], [0, 0, 1.0]])
    dist_true = (-0.1, 0.05, 0.0, 0.0, 0.0)
    board = np.stack(np.meshgrid(np.arange(9) * 0.03,
                                 np.arange(6) * 0.03), -1).reshape(-1, 2)
    obj = np.concatenate([board, np.zeros((len(board), 1))], 1)
    objs, imgs = [], []
    for v in range(5):
        rvec = rng.uniform(-0.3, 0.3, 3)
        tvec = np.array([-0.12, -0.08, rng.uniform(0.5, 0.8)])
        proj = calib.project_points(obj, rvec, tvec, k_true, dist_true)
        proj = proj + rng.normal(0, 0.1, proj.shape)
        objs.append(obj)
        imgs.append(proj)
    rms, k, dist, rvecs, tvecs, std, per_view = \
        ce.calibrate_camera_extended(objs, imgs, (640, 480))
    assert rms < 0.2
    assert len(per_view) == 5 and np.allclose(per_view.mean(), rms,
                                              atol=0.05)
    # stddevs: positive, small relative to the parameters
    assert std.shape == (9,)
    assert (std[:2] > 0).all() and (std[:2] < 10).all()
    # recovered focal within 3 stddevs-ish of truth (sanity)
    assert abs(k[0, 0] - 610) < max(5 * std[0], 3.0)


def test_register_cameras(rng):
    from rustcv_tpu.ops import calib

    k1 = np.array([[520.0, 0, 320], [0, 510.0, 240], [0, 0, 1.0]])
    k2 = np.array([[480.0, 0, 300], [0, 470.0, 230], [0, 0, 1.0]])
    r_true = np.array([0.05, 0.3, -0.02])
    t_true = np.array([-0.2, 0.01, 0.05])
    rm = calib.rodrigues(r_true)
    board = np.stack(np.meshgrid(np.arange(7) * 0.04,
                                 np.arange(5) * 0.04), -1).reshape(-1, 2)
    obj = np.concatenate([board, np.zeros((len(board), 1))], 1)
    objs, im1, im2 = [], [], []
    for v in range(4):
        rv = rng.uniform(-0.2, 0.2, 3)
        tv = np.array([-0.12, -0.08, rng.uniform(0.6, 0.9)])
        p1 = calib.project_points(obj, rv, tv, k1, (0, 0, 0, 0, 0))
        rv2 = calib.rodrigues(rm @ calib.rodrigues(rv))
        tv2 = rm @ tv + t_true
        p2 = calib.project_points(obj, rv2, tv2, k2, (0, 0, 0, 0, 0))
        noise = rng.normal(0, 0.05, p1.shape)
        objs.append(obj)
        im1.append(p1 + noise)
        im2.append(p2 + rng.normal(0, 0.05, p2.shape))
    rms, rv, tv = ce.register_cameras(objs, im1, im2, k1,
                                      (0, 0, 0, 0, 0), k2,
                                      (0, 0, 0, 0, 0))
    assert rms < 0.15
    np.testing.assert_allclose(rv, r_true, atol=2e-3)
    np.testing.assert_allclose(tv, t_true, atol=2e-3)


def test_solve_pnp_generic(rng):
    from rustcv_tpu.ops import calib

    k = np.array([[520.0, 0, 320], [0, 510.0, 240], [0, 0, 1.0]])
    obj = rng.uniform(-0.2, 0.2, (6, 3))
    rvec = np.array([0.1, -0.2, 0.05])
    tvec = np.array([0.02, -0.05, 0.8])
    img = calib.project_points(obj, rvec, tvec, k, (0, 0, 0, 0, 0))
    n, sols, errs = ce.solve_pnp_generic(obj, img, k)
    assert n == 1 and errs[0] < 1e-6
    np.testing.assert_allclose(sols[0][0], rvec, atol=1e-6)
    # 3-point route returns the multi-solution P3P set
    n3, sols3, errs3 = ce.solve_pnp_generic(obj[:3], img[:3], k)
    assert n3 >= 1 and (errs3 < 1e-6).all()


def test_draw_frame_axes(rng):
    img = rng.integers(0, 100, (120, 160), np.uint8)
    k = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1.0]])
    out = ce.draw_frame_axes(img, k, (0, 0, 0, 0, 0),
                             (0.1, -0.2, 0.0), (0.0, 0.0, 0.5), 0.1)
    assert out.shape == (120, 160, 3)
    # the three axis colors appear
    for color in ((0, 0, 255), (0, 255, 0), (255, 0, 0)):
        assert (out == color).all(-1).any(), color
    ref = cv2.drawFrameAxes(
        np.stack([img] * 3, -1).copy(), k, np.zeros(5),
        np.array([0.1, -0.2, 0.0]), np.array([0.0, 0.0, 0.5]), 0.1)
    # painted regions overlap substantially with cv2's
    ours_painted = (out != np.stack([img] * 3, -1)).any(-1)
    ref_painted = (ref != np.stack([img] * 3, -1)).any(-1)
    inter = (ours_painted & ref_painted).sum()
    assert inter > 0.4 * min(ours_painted.sum(), ref_painted.sum())


def test_mesh_round_trip(tmp_path, rng):
    from rustcv_tpu.ops import threed

    v = rng.random((8, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]], np.int32)
    path = str(tmp_path / "m.ply")
    threed.save_mesh(path, v, f)
    v2, f2 = threed.load_mesh(path)
    np.testing.assert_allclose(v2, v, rtol=1e-6)
    np.testing.assert_array_equal(f2, f)
    # cv2 loads our mesh
    res = cv2.loadMesh(path)
    cv_v = res[0].reshape(-1, 3)
    np.testing.assert_allclose(cv_v, v, rtol=1e-6)


def test_solve_pnp_epnp(rng):
    from rustcv_tpu.ops import calib

    k = np.array([[520.0, 0, 320], [0, 510.0, 240], [0, 0, 1.0]])
    obj = rng.uniform(-0.3, 0.3, (10, 3))  # general (non-planar) cloud
    rvec = np.array([0.3, -0.2, 0.15])
    tvec = np.array([0.05, -0.02, 1.2])
    img = calib.project_points(obj, rvec, tvec, k, (0, 0, 0, 0, 0))
    rv, tv = ce.solve_pnp_epnp(obj, img, k)
    np.testing.assert_allclose(rv, rvec, atol=1e-6)
    np.testing.assert_allclose(tv, tvec, atol=1e-6)
    # noisy observations stay close
    img_n = img + rng.normal(0, 0.3, img.shape)
    rv, tv = ce.solve_pnp_epnp(obj, img_n, k)
    np.testing.assert_allclose(rv, rvec, atol=2e-2)
    np.testing.assert_allclose(tv, tvec, atol=2e-2)

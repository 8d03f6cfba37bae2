"""Generalized Hough (Ballard): oracle finds planted instances, device
scan matches the oracle, cross-check vs cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import ghough

cv2 = pytest.importorskip("cv2")


def _template(size=32):
    t = np.full((size, size), 40, np.uint8)
    # an asymmetric mark: triangle + bar
    for y in range(6, 26):
        t[y, 6:6 + (y - 5)] = 210
    t[8:12, 20:29] = 210
    return t


def _scene(positions, shape=(140, 180)):
    img = np.full(shape, 40, np.uint8)
    t = _template()
    for (cy, cx) in positions:
        y0, x0 = cy - 16, cx - 16
        img[y0:y0 + 32, x0:x0 + 32] = t
    return img


@pytest.fixture(scope="module")
def setup():
    t = _template()
    table = ghough.build_r_table(t)
    scene = _scene([(40, 50), (90, 120)])
    return t, table, scene


def test_detects_planted_instances(setup):
    _, table, scene = setup
    pos, votes = ghough.ghough_detect(scene, table,
                                      votes_threshold=len(table) // 4)
    assert len(pos) >= 2
    found = {(int(round(p[1])), int(round(p[0]))) for p in pos[:4]}
    for cy, cx in [(40, 50), (90, 120)]:
        assert any(abs(fy - cy) <= 2 and abs(fx - cx) <= 2
                   for fy, fx in found), (cy, cx)


def test_no_false_peaks_on_flat(setup):
    _, table, _ = setup
    flat = np.full((100, 120), 57, np.uint8)
    pos, _ = ghough.ghough_detect(flat, table, votes_threshold=10)
    assert len(pos) == 0


def test_device_accumulator_bit_exact(setup, jax_cpu):
    _, table, scene = setup
    acc_np = ghough.ghough_accumulate_numpy(scene, table)
    acc_dev = np.asarray(ghough.ghough_accumulate(jnp.asarray(scene),
                                                  table))
    np.testing.assert_array_equal(acc_np, acc_dev)


def test_vs_cv2(setup):
    t, table, scene = setup
    gh = cv2.createGeneralizedHoughBallard()
    gh.setTemplate(t)
    gh.setVotesThreshold(20)
    result = gh.detect(scene)
    if result is None or result[0] is None:
        pytest.skip("cv2 found nothing on this scene")
    ref = result[0].reshape(-1, 4)[:, :2]
    pos, _ = ghough.ghough_detect(scene, table,
                                  votes_threshold=len(table) // 4)
    # cv2 smears detections along its quantization diagonal; each of
    # OUR (cleaner, one-per-instance) peaks must appear in cv2's list
    assert len(pos) == 2
    for px, py in pos:
        assert any(abs(px - rx) <= 1 and abs(py - ry) <= 1
                   for rx, ry in ref), (px, py)


def test_guil_rotation_scale(setup):
    t, table, _ = setup
    # plant a rotated + scaled instance
    angle_deg, scale = 20.0, 1.25
    m = cv2.getRotationMatrix2D((16, 16), -angle_deg, scale)
    warped = cv2.warpAffine(t, m, (48, 48), borderValue=40)
    scene = np.full((120, 150), 40, np.uint8)
    scene[30:78, 50:98] = warped
    pos, votes, angs, scls = ghough.ghough_detect_guil(
        scene, table, votes_threshold=len(table) // 2,
        angles=np.deg2rad(np.arange(-40, 41, 10)),
        scales=(0.8, 1.0, 1.25))
    assert len(pos) >= 1
    # best detection near the planted centre (warp keeps centre at
    # template centre (16,16) → scene (66, 46))
    px, py = pos[0]
    assert abs(px - 66) <= 3 and abs(py - 46) <= 3, pos[0]
    # recovered hypothesis: the planted rotation and scale
    assert abs(np.degrees(angs[0]) - angle_deg) <= 10.1
    assert abs(scls[0] - scale) < 0.25

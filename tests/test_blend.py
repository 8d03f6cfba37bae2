"""Stitching detail components: multi-band blend (oracle + device),
gain compensation vs cv2's GainCompensator behavior, Voronoi seams."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import blend

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def halves():
    rng = np.random.default_rng(1234)
    # two images of the same scene with different exposures
    scene = rng.integers(40, 200, (64, 96, 3)).astype(np.float64)
    scene = np.stack([cv2.GaussianBlur(scene[..., c].astype(np.float32),
                                       (5, 5), 2.0) for c in range(3)],
                     -1).astype(np.float64)
    a = np.clip(scene * 1.15, 0, 255).astype(np.uint8)
    b = np.clip(scene * 0.85, 0, 255).astype(np.uint8)
    mask = np.zeros((64, 96), np.float64)
    mask[:, :52] = 1.0  # img a keeps the left side (4px overlap ramp)
    return a, b, mask, scene


def test_multi_band_blend_smooth_seam(halves):
    a, b, mask, _ = halves
    hard = np.where(mask[:, None].transpose(0, 2, 1) if False else
                    mask[..., None] > 0.5, a.astype(float),
                    b.astype(float))
    out = blend.multi_band_blend_numpy(a, b, mask, n_bands=4)
    # seam gradient must be smaller than the hard cut's
    col = 52
    hard_jump = np.abs(np.diff(hard[:, col - 2:col + 2, 0],
                               axis=1)).max()
    soft_jump = np.abs(np.diff(out[:, col - 2:col + 2, 0].astype(float),
                               axis=1)).max()
    assert soft_jump < 0.7 * hard_jump
    # regions far from the seam equal the sources
    np.testing.assert_array_equal(out[:, :20], a[:, :20])
    np.testing.assert_array_equal(out[:, -20:], b[:, -20:])


def test_multi_band_device_twin(halves, jax_cpu):
    a, b, mask, _ = halves
    ours = blend.multi_band_blend_numpy(a, b, mask, n_bands=4)
    dev = np.asarray(blend.multi_band_blend(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), n_bands=4))
    d = np.abs(ours.astype(int) - dev.astype(int))
    assert d.max() <= 1  # f32 vs f64 pyramid rounding


def test_gain_compensation(halves):
    a, b, _, scene = halves
    masks = [np.ones((64, 96), bool), np.ones((64, 96), bool)]
    gains = blend.gain_compensation([a, b], masks)
    # compensation brings the exposures together: the residual mean
    # mismatch shrinks by ≥70% (the β prior keeps gains near 1, so
    # the ratio is pulled slightly toward unity — cv2 does the same)
    ma, mb = a.mean(), b.mean()
    before = abs(ma - mb)
    after = abs(gains[0] * ma - gains[1] * mb)
    assert after < 0.3 * before, (gains, before, after)
    assert 0.7 < gains[0] < 1.0 < gains[1] < 1.3
    assert 0.5 < gains.mean() < 1.5


def test_voronoi_seam():
    m1 = np.zeros((20, 30), bool)
    m2 = np.zeros((20, 30), bool)
    m1[:, :20] = True
    m2[:, 10:] = True
    s1, s2 = blend.voronoi_seam(m1, m2)
    assert not (s1 & s2).any()
    assert ((s1 | s2) == (m1 | m2)).all()
    # the split lands near the overlap middle (x = 15)
    xs = np.nonzero(s1[10])[0]
    assert 13 <= xs.max() <= 16
    # non-overlap regions untouched
    assert s1[:, :10].all() and s2[:, 20:].all()

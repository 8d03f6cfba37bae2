"""Round-3 photo extensions: TV-L1 denoising, Robertson HDR
merge/calibration, Drago tonemap — cross-validated against cv2 5.0."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import hdr, tvl1

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------------------
# TV-L1


@pytest.fixture(scope="module")
def tvl1_scene():
    rng = np.random.default_rng(1234)
    clean = np.zeros((48, 56), np.uint8)
    clean[12:36, 16:44] = 180
    clean[:, :12] = 90
    obs = [np.clip(clean.astype(float) + rng.normal(0, 25, clean.shape),
                   0, 255).astype(np.uint8) for _ in range(3)]
    return clean, obs


def test_tvl1_denoises(tvl1_scene):
    clean, obs = tvl1_scene
    out = tvl1.denoise_tvl1_numpy(obs, lam=1.0, niters=60)
    noise_mae = np.abs(obs[0].astype(float) - clean).mean()
    out_mae = np.abs(out.astype(float) - clean).mean()
    assert out_mae < 0.45 * noise_mae
    # energy decreases vs the noisy input
    assert (tvl1.tv_l1_energy(out, obs) <
            tvl1.tv_l1_energy(obs[0], obs))


def test_tvl1_close_to_cv2(tvl1_scene):
    _, obs = tvl1_scene
    ours = tvl1.denoise_tvl1_numpy(obs, lam=1.0, niters=60)
    ref = np.empty_like(obs[0])
    cv2.denoise_TVL1(obs, ref, 1.0, 60)
    # different primal-dual parameterizations — same minimizer family:
    # mean within 6 LSB on a piecewise-constant scene
    assert np.abs(ours.astype(float) - ref.astype(float)).mean() < 6.0


def test_tvl1_device_twin(tvl1_scene, jax_cpu):
    _, obs = tvl1_scene
    ours = tvl1.denoise_tvl1_numpy(obs, lam=1.0, niters=40)
    dev = np.asarray(tvl1.denoise_tvl1(jnp.asarray(np.stack(obs)),
                                       lam=1.0, niters=40))
    d = np.abs(ours.astype(int) - dev.astype(int))
    assert d.max() <= 2 and (d > 0).mean() < 0.02


# ---------------------------------------------------------------------------
# Robertson


@pytest.fixture(scope="module")
def exposure_stack():
    rng = np.random.default_rng(4321)
    radiance = (rng.random((24, 32, 3)) ** 2 * 4 + 0.02).astype(
        np.float32)
    times = np.array([0.0125, 0.05, 0.2, 0.8], np.float32)
    imgs = [np.clip(radiance * 255 * t * 4, 0, 255).astype(np.uint8)
            for t in times]
    return radiance, times, imgs


def test_merge_robertson_matches_cv2(exposure_stack):
    _, times, imgs = exposure_stack
    # same response → outputs must agree (isolates the merge formula)
    resp = cv2.createCalibrateRobertson().process(imgs, times)
    ours = hdr.merge_robertson_numpy(imgs, times, resp)
    ref = cv2.createMergeRobertson().process(imgs, times, resp)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-6)


def test_merge_robertson_default_response(exposure_stack):
    _, times, imgs = exposure_stack
    ours = hdr.merge_robertson_numpy(imgs, times)
    ref = cv2.createMergeRobertson().process(imgs, times)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=1e-6)


def test_calibrate_robertson_recovers_linear(exposure_stack):
    _, times, imgs = exposure_stack
    resp = hdr.calibrate_robertson(imgs, times)
    # the synthetic camera is linear: recovered response ≈ z (scaled)
    z = np.arange(40, 220)
    for c in range(3):
        g = resp[c][z]
        fit = np.polyfit(z, g, 1)
        pred = np.polyval(fit, z)
        assert np.abs(g - pred).max() < 0.08 * g.max()
    # end-to-end: our calibrate + our merge ≈ true radiance (up to scale)
    rad = hdr.merge_robertson_numpy(imgs, times, resp)
    true_rad, _, _ = exposure_stack
    mask = (imgs[1] > 10) & (imgs[2] < 245)  # well-exposed mid-stack
    assert mask.sum() > 100
    ratio = rad[mask] / true_rad[mask]
    assert np.std(ratio) / np.mean(ratio) < 0.15


# ---------------------------------------------------------------------------
# Drago


def test_tonemap_drago_vs_cv2(rng):
    hdr_img = (rng.random((24, 32, 3)).astype(np.float32) ** 2 * 8
               + 0.02)
    for gamma, bias in [(1.0, 0.85), (2.2, 0.85), (1.0, 0.7)]:
        ours = hdr.tonemap_drago_numpy(hdr_img, gamma=gamma, bias=bias)
        ref = cv2.createTonemapDrago(gamma, 1.0, bias).process(hdr_img)
        fin = np.isfinite(ref)  # cv2 emits NaN on its own -0 pixels
        assert fin.mean() > 0.99
        assert np.abs(ours - ref)[fin].mean() < 0.01, (gamma, bias)
        assert 0.0 <= ours.min() and ours.max() <= 1.0


def test_tonemap_mantiuk_vs_cv2(rng):
    base = rng.random((32, 40, 3)).astype(np.float64) ** 2
    hdr_img = (base * np.logspace(0, 2.5, 40)[None, :, None]).astype(
        np.float32) + 0.01
    ours = hdr.tonemap_mantiuk_numpy(hdr_img, 1.0, 0.7, 1.0)
    ref = cv2.createTonemapMantiuk(1.0, 0.7, 1.0).process(hdr_img)
    fin = np.isfinite(ref)
    corr = np.corrcoef(ours[fin].ravel(), ref[fin].ravel())[0, 1]
    assert corr > 0.9, corr
    assert 0.0 <= ours.min() and ours.max() <= 1.0
    # dynamic range genuinely compressed: shadows get more code values
    lin = (hdr_img - hdr_img.min()) / (hdr_img.max() - hdr_img.min())
    dark_ours = (ours < 0.02).mean()
    dark_lin = (lin < 0.02).mean()
    assert dark_ours < dark_lin

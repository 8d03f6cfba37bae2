"""HDR stack: Mertens fusion recovers detail from both exposure ends,
Debevec calibration recovers a known response, tonemap sanity, device
fusion matches the oracle."""

import numpy as np
import pytest

from rustcv_tpu.ops import hdr


def _radiance_scene(h=64, w=96):
    """Ground-truth linear radiance with detail in shadows AND highlights."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.where(xs < w / 2, 0.02, 1.0)         # dark half / bright half
    texture = 1.0 + 0.4 * np.sin(xs * 1.1) * np.cos(ys * 0.9)
    rad = base * texture
    return np.stack([rad, rad * 0.8, rad * 1.2], axis=-1)  # BGR-ish


def _expose(rad, t):
    """Linear exposure + clipping camera (identity response)."""
    return np.clip(rad * t * 255.0, 0, 255).astype(np.uint8)


class TestMertens:
    def test_recovers_both_ends(self):
        rad = _radiance_scene()
        stack = [_expose(rad, t) for t in (0.25, 1.0, 8.0)]
        fused = hdr.merge_mertens_numpy(stack)
        assert fused.shape == rad.shape and fused.dtype == np.float32
        assert fused.min() >= 0.0 and fused.max() <= 1.0
        gray = fused.mean(axis=-1)
        dark = gray[8:-8, 8:44]
        bright = gray[8:-8, 52:-8]
        # texture survives in BOTH halves: the short exposure saturates
        # the bright half, the long exposure crushes the dark half —
        # fusion must beat the best single exposure in each region
        singles = [np.asarray(s, np.float64).mean(-1) / 255.0
                   for s in stack]
        assert dark.std() > 0.8 * max(s[8:-8, 8:44].std() for s in singles)
        assert bright.std() > 0.8 * max(s[8:-8, 52:-8].std()
                                        for s in singles)

    def test_identical_stack_is_identity_like(self):
        img = np.tile(np.linspace(40, 200, 96).astype(np.uint8),
                      (64, 1))[..., None].repeat(3, -1)
        fused = hdr.merge_mertens_numpy([img, img, img])
        assert np.abs(fused * 255.0 - img).mean() < 3.0

    def test_device_matches_oracle(self, jax_cpu):
        import jax.numpy as jnp

        rad = _radiance_scene()
        stack = [_expose(rad, t) for t in (0.25, 1.0, 8.0)]
        g = hdr.merge_mertens_numpy(stack)
        d = np.asarray(hdr.merge_mertens(jnp.asarray(np.stack(stack))))
        np.testing.assert_allclose(d, g, atol=2e-3)


class TestDebevec:
    def test_recovers_linear_response_and_radiance(self):
        rad = _radiance_scene()
        times = [0.125, 0.5, 2.0, 8.0]
        stack = [_expose(rad, t) for t in times]
        resp = hdr.calibrate_debevec(stack, times)
        # identity camera → g(z) ≈ ln(z/255·k): check monotonic + log-linear
        z = np.arange(30, 220)
        for c in range(3):
            g = resp[c]
            assert np.all(np.diff(g[30:220]) > -1e-6)
            fit = np.polyfit(np.log(z / 255.0), g[z], 1)
            assert abs(fit[0] - 1.0) < 0.15  # slope ~1 in log space
        merged = hdr.merge_debevec_numpy(stack, times, resp)
        # radiance ratios recovered (scale-free): bright/dark ≈ 50
        ratio = np.median(merged[8:-8, 52:-8, 0]) / np.median(
            merged[8:-8, 8:44, 0])
        true_ratio = np.median(rad[8:-8, 52:-8, 0]) / np.median(
            rad[8:-8, 8:44, 0])
        assert abs(np.log(ratio / true_ratio)) < 0.25


class TestTonemap:
    def test_reinhard_compresses_range(self):
        rad = _radiance_scene() * 10.0
        out = hdr.tonemap_reinhard_numpy(rad)
        assert out.dtype == np.uint8 and out.shape == rad.shape
        gray = out.mean(-1)
        # both halves visible (not crushed/saturated)
        assert 5 < gray[8:-8, 8:44].mean() < 250
        assert 5 < gray[8:-8, 52:-8].mean() < 250
        assert gray[8:-8, 52:-8].mean() > gray[8:-8, 8:44].mean()


def _blob_scene(seed=7, h=256, w=320):
    """Natural-photo analog: large Gaussian blobs + mild noise — MTB
    bitmaps keep structure at EVERY pyramid level, which the algorithm
    requires (on blurred noise the coarse 4x5-px levels degenerate to
    err=0 everywhere and cv2 itself drifts to the +-63 corner — the r5
    exactness rework revealed the old recovery expectation was testing
    a behavior real cv2 does not have)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for _ in range(6):
        cy, cx = rng.uniform(40, h - 40), rng.uniform(40, w - 40)
        s = rng.uniform(25, 70)
        img += rng.uniform(60, 120) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += rng.normal(0, 6, img.shape)
    return (img / img.max() * 235 + 10).clip(0, 255).astype(np.uint8)


class TestAlignMTB:
    def test_recovers_known_shift(self):
        base = _blob_scene()
        for true in [(3, -5), (-7, 2), (0, 0), (11, 9)]:
            shifted = hdr._shift2d(base, *true)
            dy, dx = hdr.align_mtb_shift(base, shifted)
            # aligning the shifted image back onto base
            assert (dy, dx) == (-true[0], -true[1])

    def test_matches_cv2_calculate_shift(self):
        """The exactness contract: our (dy, dx) == cv2's Point(x, y)
        swapped, INCLUDING on degenerate inputs where the algorithm
        fails to recover (blurred noise drifts to the corner — so must
        we, identically)."""
        cv2 = pytest.importorskip("cv2")
        amtb = cv2.createAlignMTB()
        rng = np.random.default_rng(4)
        noise = rng.integers(0, 256, (128, 160)).astype(np.uint8)
        from rustcv_tpu.ops.sift import _blur

        noise = _blur(noise.astype(np.float64), 2.0)
        noise = ((noise - noise.min()) / np.ptp(noise) * 255).astype(np.uint8)
        for base in (_blob_scene(), noise):
            for true in [(3, -5), (-7, 2), (0, 0), (11, 9)]:
                shifted = hdr._shift2d(base, *true)
                dy, dx = hdr.align_mtb_shift(base, shifted)
                x, y = amtb.calculateShift(base, shifted)
                assert (dy, dx) == (y, x), (true, (dy, dx), (y, x))

    def test_align_stack_under_exposure_change(self):
        # cv2 semantics: the PIVOT is images[len//2] and passes through
        # unchanged — so the moved exposure must sit OFF-pivot (a
        # 2-stack's second image IS the pivot and stays put)
        base = _blob_scene(seed=6, h=192, w=256).astype(np.float64)
        bright = np.clip(base * 1.4, 0, 255).astype(np.uint8)
        mid = np.clip(base, 0, 255).astype(np.uint8)
        dark = np.clip(base * 0.5, 0, 255).astype(np.uint8)
        moved = hdr._shift2d(dark, 4, -6)
        stack3 = [np.stack([im] * 3, -1)
                  for im in (moved, mid, bright)]
        aligned = hdr.align_mtb(stack3)
        # pivot untouched; the moved dark exposure came back into
        # register (MTB is exposure-invariant: each thresholds at its
        # own median)
        np.testing.assert_array_equal(aligned[1], stack3[1])
        sel = np.s_[12:-12, 12:-12]
        realigned = aligned[0][..., 0][sel].astype(int)
        target = dark[sel].astype(int)
        assert np.abs(realigned - target).mean() < \
            np.abs(moved[sel].astype(int) - target).mean()

"""Phase correlation — shift recovery (integer, sub-pixel, wrapped
negative), oracle parity, and the no-correlation response floor."""

import numpy as np
import pytest

from rustcv_tpu.ops import golden, registration


def _tex(seed, h, w):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w), np.uint8)
    return golden.gaussian5_u8(a)


class TestPhaseCorrelate:
    def test_integer_shift(self, jax_cpu):
        base = _tex(0, 128, 160)
        nxt = np.roll(np.roll(base, 5, axis=1), -3, axis=0)
        d, resp = registration.phase_correlate(base, nxt)
        d = np.asarray(d)
        assert abs(d[0] - 5) < 0.05 and abs(d[1] + 3) < 0.05
        assert float(resp) > 0.5

    def test_device_matches_oracle(self, jax_cpu):
        base = _tex(1, 96, 128)
        nxt = np.roll(base, 7, axis=1)
        d_d, r_d = registration.phase_correlate(base, nxt)
        d_n, r_n = registration.phase_correlate_numpy(base, nxt)
        np.testing.assert_allclose(np.asarray(d_d), d_n, atol=1e-3)
        assert abs(float(r_d) - r_n) < 1e-3

    def test_subpixel_shift(self, jax_cpu):
        """A true 2.5-px shift built in the Fourier domain recovers to
        ~0.1 px via the centroid."""
        base = _tex(2, 128, 128).astype(np.float64)
        F = np.fft.rfft2(base)
        kx = np.fft.rfftfreq(128)
        shifted = np.fft.irfft2(F * np.exp(-2j * np.pi * kx[None, :] * 2.5),
                                s=(128, 128))
        nxt = np.clip(np.round(shifted), 0, 255).astype(np.uint8)
        d, _ = registration.phase_correlate(base.astype(np.uint8), nxt)
        assert abs(float(np.asarray(d)[0]) - 2.5) < 0.15

    def test_zero_shift(self, jax_cpu):
        base = _tex(3, 64, 64)
        d, resp = registration.phase_correlate(base, base)
        assert np.abs(np.asarray(d)).max() < 1e-3
        assert float(resp) > 0.9

    def test_uncorrelated_low_response(self, jax_cpu):
        a = _tex(4, 64, 64)
        b = _tex(5, 64, 64)
        _, resp = registration.phase_correlate(a, b)
        assert float(resp) < 0.2

    def test_window_off(self, jax_cpu):
        base = _tex(6, 96, 96)
        nxt = np.roll(base, 4, axis=0)
        d, _ = registration.phase_correlate(base, nxt, window=False)
        assert abs(float(np.asarray(d)[1]) - 4) < 0.05

    def test_facade(self, jax_cpu):
        import jax.numpy as jnp

        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        base = _tex(7, 80, 96)
        nxt = np.roll(base, 2, axis=1)
        d_h, r_h = imgproc.phase_correlate(Mat.from_array(base), Mat.from_array(nxt))
        d_d, r_d = imgproc.phase_correlate(
            Mat.from_device(jnp.asarray(base)), Mat.from_device(jnp.asarray(nxt)))
        np.testing.assert_allclose(d_h, d_d, atol=1e-3)
        assert abs(d_d[0] - 2) < 0.05

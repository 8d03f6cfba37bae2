"""Polar warps + discrete transforms: geometric contracts (rings →
columns, rotation → row shift, roundtrip), DCT orthonormality and
device/oracle agreement, DFT helpers."""

import numpy as np
import pytest

from rustcv_tpu.ops import transform, warp


def _ring_image(h=128, w=128, r0=30, r1=34):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    r = np.hypot(xs - w / 2, ys - h / 2)
    return np.where((r >= r0) & (r < r1), 220, 30).astype(np.uint8)


class TestPolar:
    def test_ring_becomes_column_band(self):
        img = _ring_image()
        pol = warp.warp_polar(img, (64, 64), 64.0, (128, 128))
        on = pol > 120
        cols = np.where(on.any(axis=0))[0]
        # radius 30-34 at 64px radius span of 128 cols → cols ~60-68
        assert cols.min() >= 55 and cols.max() <= 72
        assert on[:, cols.min():cols.max() + 1].mean() > 0.8

    def test_rotation_is_row_shift(self):
        rng = np.random.default_rng(2)
        img = np.zeros((128, 128), np.uint8)
        # a radial wedge pattern, smooth enough to compare after shift
        ys, xs = np.mgrid[0:128, 0:128].astype(np.float64)
        ang = np.arctan2(ys - 64, xs - 64)
        img = (127 + 100 * np.cos(3 * ang)).astype(np.uint8)
        pol = warp.warp_polar(img, (64, 64), 60.0, (180, 64))
        m = warp.get_rotation_matrix_2d((64.0, 64.0), 40.0, 1.0)
        rot = warp.warp_affine_numpy(img, m, (128, 128))
        pol_rot = warp.warp_polar(rot, (64, 64), 60.0, (180, 64))
        shift = round(40.0 / (360.0 / 180))  # rows per degree
        a = pol[:, 10:50].astype(int)
        b = np.roll(pol_rot, shift, axis=0)[:, 10:50].astype(int)
        assert np.mean(np.abs(a - b)) < 6.0

    def test_forward_inverse_roundtrip(self):
        ys, xs = np.mgrid[0:96, 0:96].astype(np.float64)
        img = (127 + 60 * np.sin(xs / 9.0) * np.cos(ys / 7.0)).astype(np.uint8)
        pol = warp.warp_polar(img, (48, 48), 48.0, (256, 128))
        back = warp.warp_polar(pol, (48, 48), 48.0, (96, 96), inverse=True)
        r = np.hypot(xs - 48, ys - 48)
        sel = (r > 5) & (r < 40)
        assert np.mean(np.abs(back[sel].astype(int) - img[sel])) < 8.0

    def test_log_polar_device_matches_oracle(self, jax_cpu):
        import jax.numpy as jnp

        img = _ring_image(96, 96, 20, 24)
        host = warp.log_polar(img, (48, 48), 48.0)
        dev = np.asarray(warp.log_polar(jnp.asarray(img), (48, 48), 48.0))
        np.testing.assert_array_equal(host, dev)


class TestDCT:
    def test_orthonormal_roundtrip(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (16, 24))
        back = transform.dct_numpy(transform.dct_numpy(a), inverse=True)
        np.testing.assert_allclose(back, a, atol=1e-12)
        # Parseval: energy preserved
        c = transform.dct_numpy(a)
        assert abs((c ** 2).sum() - (a ** 2).sum()) < 1e-9

    def test_dc_term(self):
        a = np.full((8, 8), 5.0)
        c = transform.dct_numpy(a)
        assert abs(c[0, 0] - 5.0 * 8) < 1e-12  # sqrt(1/8)*sqrt(1/8)*64*5
        assert np.abs(c[1:, :]).max() < 1e-12
        assert np.abs(c[:, 1:]).max() < 1e-12

    def test_1d_rows(self):
        a = np.cos(np.pi * (2 * np.arange(8) + 1) * 3 / 16)[None, :]
        c = transform.dct_numpy(a)
        assert abs(c[0, 3] - np.sqrt(8 / 2)) < 1e-12
        mask = np.ones(8, bool); mask[3] = False
        assert np.abs(c[0, mask]).max() < 1e-12

    def test_device_matches_oracle(self, jax_cpu):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 1, (32, 16)).astype(np.float32)
        g = transform.dct_numpy(a)
        d = np.asarray(transform.dct(a))
        np.testing.assert_allclose(d, g, atol=1e-4)
        gi = transform.dct_numpy(g, inverse=True)
        di = np.asarray(transform.dct(d.astype(np.float32), inverse=True))
        np.testing.assert_allclose(di, gi, atol=1e-4)


class TestDFTHelpers:
    @pytest.mark.parametrize("n,want", [
        (1, 1), (97, 100), (100, 100), (101, 108), (193, 200),
        (1000, 1000), (1001, 1024),
    ])
    def test_optimal_dft_size(self, n, want):
        assert transform.get_optimal_dft_size(n) == want

    def test_mul_spectrums_correlation(self):
        rng = np.random.default_rng(3)
        a = rng.normal(0, 1, (16, 16))
        b = np.roll(a, (2, 5), axis=(0, 1))
        sa, sb = transform.dft(a), transform.dft(b)
        corr = np.real(transform.idft(
            transform.mul_spectrums(sa, sb, conj_b=True), scale=True))
        py, px = np.unravel_index(corr.argmax(), corr.shape)
        assert (py, px) == (14, 11)  # −shift mod N

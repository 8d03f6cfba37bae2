"""Core arithmetic ops — saturation edges, oracle parity, facades."""

import numpy as np
import pytest

from rustcv_tpu.ops import arith


@pytest.fixture
def ab(jax_cpu):
    rng = np.random.default_rng(0)
    return (rng.integers(0, 256, (32, 40), np.uint8),
            rng.integers(0, 256, (32, 40), np.uint8))


class TestArith:
    def test_add_saturates(self, ab):
        a, b = ab
        dev = np.asarray(arith.add_u8(a, b))
        assert np.array_equal(dev, np.minimum(a.astype(int) + b.astype(int), 255))

    def test_subtract_clamps(self, ab):
        a, b = ab
        dev = np.asarray(arith.subtract_u8(a, b))
        assert np.array_equal(dev, np.maximum(a.astype(int) - b.astype(int), 0))

    def test_absdiff(self, ab):
        a, b = ab
        assert np.array_equal(np.asarray(arith.absdiff_u8(a, b)),
                              np.abs(a.astype(int) - b.astype(int)))

    def test_add_weighted_matches_oracle(self, ab):
        a, b = ab
        # dyadic weights: bit-exact
        dev = np.asarray(arith.add_weighted_u8(a, 0.75, b, 0.25, 8.0))
        assert np.array_equal(dev, arith.add_weighted_numpy(a, 0.75, b, 0.25, 8.0))
        # non-dyadic: ±1 LSB at FMA-resolved .5 boundaries
        dev = np.asarray(arith.add_weighted_u8(a, 0.7, b, 0.3, 10.0))
        ora = arith.add_weighted_numpy(a, 0.7, b, 0.3, 10.0)
        assert np.abs(dev.astype(int) - ora.astype(int)).max() <= 1

    def test_add_weighted_saturation(self, jax_cpu):
        a = np.full((4, 4), 200, np.uint8)
        dev = np.asarray(arith.add_weighted_u8(a, 1.0, a, 1.0))
        assert (dev == 255).all()

    def test_convert_scale_abs(self, ab):
        a, _ = ab
        dev = np.asarray(arith.convert_scale_abs_u8(a, -1.5, 100.0))
        assert np.array_equal(dev, arith.convert_scale_abs_numpy(a, -1.5, 100.0))

    def test_bitwise(self, ab):
        a, b = ab
        assert np.array_equal(np.asarray(arith.bitwise_and(a, b)), a & b)
        assert np.array_equal(np.asarray(arith.bitwise_or(a, b)), a | b)
        assert np.array_equal(np.asarray(arith.bitwise_xor(a, b)), a ^ b)
        assert np.array_equal(np.asarray(arith.bitwise_not(a)), ~a)

    def test_norms(self, ab):
        a, _ = ab
        assert float(arith.norm_u8(a, "l1")) == arith.norm_numpy(a, "l1")
        assert abs(float(arith.norm_u8(a, "l2"))
                   - arith.norm_numpy(a, "l2")) < 0.5
        assert float(arith.norm_u8(a, "inf")) == arith.norm_numpy(a, "inf")
        with pytest.raises(ValueError):
            arith.norm_u8(a, "l3")

    def test_count_mean_std(self, ab):
        a, _ = ab
        assert int(arith.count_non_zero(a)) == np.count_nonzero(a)
        m, s = arith.mean_stddev_u8(a)
        assert abs(float(m) - a.mean()) < 1e-2
        assert abs(float(s) - a.std()) < 1e-2

    def test_psnr(self, ab):
        a, b = ab
        assert arith.psnr_u8(a, a) == float("inf")
        want = 10 * np.log10(255**2 / np.mean((a.astype(float) - b.astype(float)) ** 2))
        assert abs(arith.psnr_u8(a, b) - want) < 0.05


class TestFacades:
    def test_mixed_residency(self, jax_cpu, ab):
        import jax.numpy as jnp

        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        a, b = ab
        mh, md = Mat.from_array(a), Mat.from_device(jnp.asarray(b))
        out = imgproc.add_weighted(mh, 0.5, md, 0.5)
        assert out.is_on_device
        want = arith.add_weighted_numpy(a, 0.5, b, 0.5)
        got = out.to_numpy()
        got = got[..., 0] if got.ndim == 3 else got
        assert np.array_equal(got, want)
        assert imgproc.count_non_zero(mh) == np.count_nonzero(a)
        assert abs(imgproc.psnr(mh, md)
                   - arith.psnr_u8(a, b)) < 1e-6
        m, s = imgproc.mean_std_dev(mh)
        assert abs(m - a.mean()) < 1e-6
        d = imgproc.absdiff(mh, Mat.from_array(b))
        got = d.to_numpy()
        got = got[..., 0] if got.ndim == 3 else got
        assert np.array_equal(got, np.abs(a.astype(int) - b.astype(int)))

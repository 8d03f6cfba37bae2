"""NL-means: device twin within +-1 LSB of the f64 oracle, actually
denoises, colored variant plumbs through Lab."""

import numpy as np

from rustcv_tpu.ops import nlmeans


def _noisy(seed=5, shape=(32, 40), sigma=12):
    rng = np.random.default_rng(seed)
    clean = np.zeros(shape, np.float64)
    clean[8:24, 10:30] = 180.0
    clean += 40.0
    noisy = clean + rng.normal(0, sigma, shape)
    return (np.clip(clean, 0, 255).astype(np.uint8),
            np.clip(noisy, 0, 255).astype(np.uint8))


class TestOracle:
    def test_reduces_noise(self):
        clean, noisy = _noisy()
        out = nlmeans.nl_means_numpy(noisy, h=15.0, template=5, search=9)
        before = np.mean((noisy.astype(float) - clean) ** 2)
        after = np.mean((out.astype(float) - clean) ** 2)
        assert after < before * 0.5

    def test_identity_on_constant(self):
        img = np.full((16, 20), 77, np.uint8)
        out = nlmeans.nl_means_numpy(img, h=10.0, template=5, search=7)
        np.testing.assert_array_equal(out, img)


class TestDeviceTwin:
    def test_matches_oracle_pm1(self, jax_cpu):
        _, noisy = _noisy()
        g = nlmeans.nl_means_numpy(noisy, h=15.0, template=5, search=9)
        d = np.asarray(nlmeans.nl_means(noisy, h=15.0, template=5, search=9))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

    def test_default_window_sizes(self, jax_cpu):
        _, noisy = _noisy(shape=(24, 28))
        g = nlmeans.nl_means_numpy(noisy)  # 7/21 defaults
        d = np.asarray(nlmeans.nl_means(noisy))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

    def test_colored_roundtrip(self, jax_cpu):
        rng = np.random.default_rng(9)
        clean = np.zeros((24, 28, 3), np.float64)
        clean[...] = (60, 120, 200)
        clean[6:18, 8:20] = (200, 80, 40)
        noisy = np.clip(clean + rng.normal(0, 10, clean.shape),
                        0, 255).astype(np.uint8)
        out = np.asarray(nlmeans.nl_means_colored(
            noisy, h=12.0, h_color=12.0, template=5, search=9))
        assert out.shape == noisy.shape and out.dtype == np.uint8
        before = np.mean((noisy.astype(float) - clean) ** 2)
        after = np.mean((out.astype(float) - clean) ** 2)
        assert after < before * 0.6


from rustcv_tpu.ops.nlmeans import (  # noqa: E402
    nl_means_multi,
    nl_means_multi_numpy,
    nl_means_numpy,
)

try:
    import pytest  # noqa: F811
    import jax.numpy as jnp  # noqa: F811
except ImportError:
    pass


class TestMulti:
    """Temporal NL-means (fastNlMeansDenoisingMulti role)."""

    @staticmethod
    def _stack(rng, n=5):
        clean = np.zeros((40, 48), np.uint8)
        clean[10:30, 12:36] = 170
        clean[:, :8] = 80
        frames = np.stack([
            np.clip(clean.astype(float)
                    + rng.normal(0, 20, clean.shape), 0,
                    255).astype(np.uint8) for _ in range(n)])
        return clean, frames

    def test_beats_single_frame(self, rng):
        clean, frames = self._stack(rng)
        single = nl_means_numpy(frames[2], h=15.0, template=5,
                                search=11)
        multi = nl_means_multi_numpy(frames, 2, 5, h=15.0, template=5,
                                     search=11)
        err_s = np.abs(single.astype(float) - clean).mean()
        err_m = np.abs(multi.astype(float) - clean).mean()
        assert err_m < 0.9 * err_s, (err_s, err_m)

    def test_device_matches_oracle(self, rng, jax_cpu):
        _, frames = self._stack(rng)
        ours = nl_means_multi_numpy(frames, 2, 3, h=12.0, template=5,
                                    search=9)
        dev = np.asarray(nl_means_multi(jnp.asarray(frames), 2, 3,
                                        h=12.0, template=5, search=9))
        d = np.abs(ours.astype(int) - dev.astype(int))
        assert d.max() <= 1

    def test_window_validation(self, rng):
        _, frames = self._stack(rng)
        with pytest.raises(ValueError):
            nl_means_multi_numpy(frames, 0, 5)
        with pytest.raises(ValueError):
            nl_means_multi_numpy(frames, 2, 4)

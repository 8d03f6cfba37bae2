"""seamlessClone: Dirichlet boundary respected, interior follows source
gradients (level shifts to blend), mixed mode keeps stronger dst edges,
device twin matches."""

import numpy as np

from rustcv_tpu.ops import poisson


def _lap(a):
    p = np.pad(a.astype(np.float64), 1, mode="edge")
    return 4 * a - (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:])


class TestNormalClone:
    def test_gradient_preserved_level_shifted(self):
        # source: bright patch with a linear ramp; dst: dark flat
        ys, xs = np.mgrid[0:32, 0:32].astype(np.float64)
        src = np.clip(150 + 2 * xs, 0, 255).astype(np.uint8)
        dst = np.full((80, 80), 40, np.uint8)
        mask = np.zeros((32, 32), bool)
        mask[4:-4, 4:-4] = True
        out = poisson.seamless_clone_numpy(src, dst, mask, (40, 40))
        # outside the mask: exactly dst
        hole = np.zeros((80, 80), bool)
        hole[40 - 16 + 4:40 - 16 + 28, 40 - 16 + 4:40 - 16 + 28] = True
        np.testing.assert_array_equal(out[~hole], dst[~hole])
        # interior laplacian ≈ source laplacian (gradients preserved)
        inner = np.zeros_like(hole)
        inner[40 - 16 + 8:40 - 16 + 24, 40 - 16 + 8:40 - 16 + 24] = True
        lap_out = _lap(out.astype(np.float64))
        assert np.abs(lap_out[inner]).max() < 1.0  # ramp: lap == 0
        # level blends toward dst: interior mean well below raw source
        assert out[inner].mean() < src[8:24, 8:24].mean() - 30

    def test_seamless_boundary(self):
        rng = np.random.default_rng(7)
        src = rng.integers(100, 256, (24, 24)).astype(np.uint8)
        dst = np.full((64, 64), 30, np.uint8)
        mask = np.ones((24, 24), bool)
        out = poisson.seamless_clone_numpy(src, dst, mask, (32, 32))
        # ring just inside the clone stays close to the dst level —
        # no hard seam (raw paste would jump by ~150)
        ring = out[32 - 11, 22:43].astype(float)
        assert np.abs(ring - 30).mean() < 35


class TestMixedClone:
    def test_keeps_stronger_dst_texture(self):
        rng = np.random.default_rng(9)
        src = np.full((24, 24), 120, np.uint8)       # flat source
        dst = rng.integers(0, 256, (64, 64)).astype(np.uint8)  # busy dst
        mask = np.ones((24, 24), bool)
        mixed = poisson.seamless_clone_numpy(
            src, dst, mask, (32, 32), flags=poisson.MIXED_CLONE)
        normal = poisson.seamless_clone_numpy(src, dst, mask, (32, 32))
        hole = np.zeros((64, 64), bool)
        hole[32 - 12 + 1:32 + 11, 32 - 12 + 1:32 + 11] = True
        # mixed keeps dst variance; normal flattens it
        assert mixed[hole].std() > 3 * normal[hole].std()


class TestDeviceTwin:
    def test_matches_oracle(self, jax_cpu):
        import jax.numpy as jnp

        ys, xs = np.mgrid[0:24, 0:24].astype(np.float64)
        src = np.clip(120 + 3 * xs + 2 * ys, 0, 255).astype(np.uint8)
        dst = np.tile(np.linspace(20, 90, 64).astype(np.uint8), (64, 1))
        mask = np.zeros((24, 24), bool)
        mask[3:-3, 3:-3] = True
        g = poisson.seamless_clone_numpy(src, dst, mask, (30, 30))
        d = np.asarray(poisson.seamless_clone(
            src, jnp.asarray(dst), mask, (30, 30)))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

    def test_color_channels(self, jax_cpu):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        src = rng.integers(100, 200, (20, 20, 3)).astype(np.uint8)
        dst = rng.integers(0, 80, (48, 48, 3)).astype(np.uint8)
        mask = np.ones((20, 20), bool)
        g = poisson.seamless_clone_numpy(src, dst, mask, (24, 24))
        d = np.asarray(poisson.seamless_clone(
            src, jnp.asarray(dst), mask, (24, 24)))
        assert g.shape == d.shape == (48, 48, 3)
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

    def test_mask_fully_outside_is_identity(self):
        src = np.full((16, 16), 200, np.uint8)
        dst = np.full((32, 32), 50, np.uint8)
        out = poisson.seamless_clone_numpy(src, dst,
                                           np.ones((16, 16), bool),
                                           (200, 200))
        np.testing.assert_array_equal(out, dst)


class TestEditingExtensions:
    def _scene(self):
        """A Gaussian bump — NON-harmonic structure (a pure ramp has
        zero divergence, so gradient scaling provably does nothing)."""
        ys, xs = np.mgrid[0:48, 0:64].astype(np.float64)
        bump = 90.0 * np.exp(-((ys - 24) ** 2 + (xs - 32) ** 2)
                             / (2 * 6.0 ** 2))
        img = np.stack([
            np.clip(60 + bump, 0, 255),
            np.clip(60 + 0.5 * bump, 0, 255),
            np.full((48, 64), 120.0),
        ], axis=-1).astype(np.uint8)
        mask = np.zeros((48, 64), bool)
        mask[8:40, 12:52] = True
        return img, mask

    def test_color_change_scales_channel(self):
        img, mask = self._scene()
        out = poisson.color_change(img, mask, mul=(1.8, 1.0, 1.0))
        amp_in = img[24, 32, 0].astype(float) - 60.0
        amp_out = out[24, 32, 0].astype(float) - 60.0
        # B bump amplitude scales by ~mul (boundary pinned far away)
        assert amp_out > 1.5 * amp_in
        # untouched G bump stays put
        assert abs(float(out[24, 32, 1]) - float(img[24, 32, 1])) <= 2
        np.testing.assert_array_equal(out[~mask], img[~mask])

    def test_illumination_change_compresses_gradients(self):
        img, mask = self._scene()
        out = poisson.illumination_change(img, mask, alpha=0.2, beta=0.6)
        # the strong bump flattens: peak amplitude shrinks
        amp_in = img[24, 32, 0].astype(float) - 60.0
        amp_out = out[24, 32, 0].astype(float) - 60.0
        assert amp_out < 0.8 * amp_in
        np.testing.assert_array_equal(out[~mask], img[~mask])

    def test_texture_flattening_kills_small_gradients(self):
        rng = np.random.default_rng(3)
        base = np.full((48, 64), 100.0)
        base[:, 32:] = 200.0           # one strong edge
        noisy = np.clip(base + rng.normal(0, 5, base.shape), 0,
                        255).astype(np.uint8)
        img = np.stack([noisy] * 3, -1)
        mask = np.zeros((48, 64), bool)
        mask[6:42, 6:58] = True
        out = poisson.texture_flattening(img, mask, low_threshold=60.0)
        g = out[..., 0].astype(float)
        # texture noise flattened hard
        assert g[10:38, 10:28].std() < 0.4 * noisy[10:38, 10:28].std()
        # the strong edge survives
        assert g[10:38, 40:56].mean() - g[10:38, 10:28].mean() > 60

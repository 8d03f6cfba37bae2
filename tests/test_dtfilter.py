"""Domain-transform filter: smooths noise, preserves edges, device scan
twin matches the f64 oracle; derived photo ops behave."""

import numpy as np

from rustcv_tpu.ops import dtfilter


def _noisy_step(h=48, w=64, seed=2):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 60.0)
    img[:, w // 2:] = 190.0
    img += rng.normal(0, 12, (h, w))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return np.stack([img] * 3, axis=-1)


class TestDTFilter:
    def test_smooths_noise_keeps_edge(self):
        img = _noisy_step()
        out = dtfilter.dt_filter_numpy(img, img, 60.0, 0.4)
        g_in = img[..., 0].astype(np.float64)
        g_out = out[..., 0].astype(np.float64)
        # noise inside each half is crushed
        assert g_out[:, 5:27].std() < 0.35 * g_in[:, 5:27].std()
        assert g_out[:, 37:-5].std() < 0.35 * g_in[:, 37:-5].std()
        # the step survives
        jump_in = g_in[:, 37:-5].mean() - g_in[:, 5:27].mean()
        jump_out = g_out[:, 37:-5].mean() - g_out[:, 5:27].mean()
        assert jump_out > 0.85 * jump_in

    def test_flat_image_fixed_point(self):
        img = np.full((32, 40, 3), 123, np.uint8)
        out = dtfilter.dt_filter_numpy(img, img)
        np.testing.assert_array_equal(out, img)

    def test_device_matches_oracle(self, jax_cpu):
        import jax.numpy as jnp

        img = _noisy_step()
        g = dtfilter.dt_filter_numpy(img, img, 60.0, 0.4)
        d = np.asarray(dtfilter.dt_filter(jnp.asarray(img),
                                          jnp.asarray(img), 60.0, 0.4))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1


class TestDerivedOps:
    def test_detail_enhance_boosts_contrast(self):
        rng = np.random.default_rng(5)
        img = np.clip(128 + rng.normal(0, 10, (48, 64, 3)), 0,
                      255).astype(np.uint8)
        out = dtfilter.detail_enhance(img)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert out.astype(float).std() > img.astype(float).std()

    def test_stylization_flattens_but_keeps_edges_dark(self):
        img = _noisy_step()
        out = dtfilter.stylization(img)
        g = out[..., 0].astype(float)
        # interior flat, edge column darker than either side
        edge_band = g[:, 30:34].mean()
        assert edge_band < g[:, 10:24].mean() or edge_band < g[:, 40:-6].mean()

    def test_pencil_sketch_white_flats_dark_edges(self):
        img = _noisy_step()
        sketch, color = dtfilter.pencil_sketch(img)
        assert sketch.shape == img.shape[:2] and color.shape == img.shape
        s = sketch.astype(float)
        assert s[:, 5:24].mean() > 200       # flat regions ~white
        assert s[:, 30:34].min() < 170       # the step edge draws a line

    def test_derived_ops_device_inputs(self, jax_cpu):
        import jax.numpy as jnp

        img = _noisy_step()
        j = jnp.asarray(img)
        de = np.asarray(dtfilter.detail_enhance(j))
        st = np.asarray(dtfilter.stylization(j))
        sk, co = dtfilter.pencil_sketch(j)
        assert de.shape == st.shape == img.shape
        assert np.asarray(sk).shape == img.shape[:2]
        # device and host derived ops agree closely
        de_h = dtfilter.detail_enhance(img)
        assert np.abs(de.astype(int) - de_h.astype(int)).max() <= 2


class TestGuidedFilter:
    def test_edge_preserving_smoothing(self):
        rng = np.random.default_rng(8)
        img = np.full((48, 64), 60.0)
        img[:, 32:] = 190.0
        noisy = np.clip(img + rng.normal(0, 12, img.shape), 0,
                        255).astype(np.uint8)
        out = dtfilter.guided_filter(noisy, noisy, radius=6, eps=1e-2)
        g = out.astype(float)
        assert g[:, 6:26].std() < 0.5 * noisy[:, 6:26].astype(float).std()
        jump = g[:, 38:-6].mean() - g[:, 6:26].mean()
        assert jump > 0.8 * 130

    def test_guide_steers_other_input(self):
        # flat input filtered under an edgy guide stays flat
        guide = np.zeros((32, 40), np.uint8)
        guide[:, 20:] = 200
        src = np.full((32, 40), 99, np.uint8)
        out = dtfilter.guided_filter(guide, src, radius=4)
        assert np.abs(out.astype(int) - 99).max() <= 1

    def test_device_matches_oracle(self, jax_cpu):
        import jax.numpy as jnp

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
        src = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        g = dtfilter.guided_filter(img, src, radius=5)
        d = np.asarray(dtfilter.guided_filter(jnp.asarray(img),
                                              jnp.asarray(src), radius=5))
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

"""Inpainting: smooth scenes restore through holes (both methods),
known pixels untouched, device diffusion matches the oracle."""

import numpy as np
import pytest

from rustcv_tpu.ops import inpaint


def _scene(shape=(48, 64)):
    ys, xs = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    img = 60 + 2.0 * xs + 1.0 * ys
    return np.clip(img, 0, 255).astype(np.uint8)


def _scratch_mask(shape=(48, 64)):
    m = np.zeros(shape, bool)
    m[20:24, 10:50] = True      # horizontal scratch
    m[8:40, 30:33] = True       # vertical scratch
    return m


class TestTelea:
    def test_restores_linear_gradient(self):
        img = _scene()
        mask = _scratch_mask()
        damaged = img.copy()
        damaged[mask] = 255
        out = inpaint.inpaint(damaged, mask, method="telea")
        err = np.abs(out[mask].astype(int) - img[mask].astype(int))
        assert err.mean() < 3.0 and err.max() <= 12
        # untouched outside the hole
        np.testing.assert_array_equal(out[~mask], damaged[~mask])

    def test_color_channels_independent(self):
        img = np.stack([_scene(), 255 - _scene(), _scene() // 2], axis=-1)
        mask = _scratch_mask()
        damaged = img.copy()
        damaged[mask] = 0
        out = inpaint.inpaint(damaged, mask, method="telea")
        err = np.abs(out[mask].astype(int) - img[mask].astype(int))
        assert err.mean() < 4.0

    def test_empty_mask_identity(self):
        img = _scene()
        out = inpaint.inpaint(img, np.zeros_like(img, bool))
        np.testing.assert_array_equal(out, img)


class TestDiffusion:
    def test_restores_linear_gradient(self):
        img = _scene()
        mask = _scratch_mask()
        damaged = img.copy()
        damaged[mask] = 255
        out = inpaint.inpaint(damaged, mask, method="diffusion")
        err = np.abs(out[mask].astype(int) - img[mask].astype(int))
        assert err.mean() < 2.0 and err.max() <= 8
        np.testing.assert_array_equal(out[~mask], damaged[~mask])

    def test_device_matches_oracle(self, jax_cpu):
        import jax.numpy as jnp

        img = _scene()
        mask = _scratch_mask()
        damaged = img.copy()
        damaged[mask] = 255
        g = inpaint.inpaint_diffusion_numpy(damaged, mask)
        d = np.asarray(inpaint.inpaint_diffusion(
            jnp.asarray(damaged), jnp.asarray(mask)))
        # f32 fixed-iteration vs f64 tol early-out: ±1 LSB
        assert np.abs(d.astype(int) - g.astype(int)).max() <= 1

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            inpaint.inpaint(_scene(), _scratch_mask(), method="nope")

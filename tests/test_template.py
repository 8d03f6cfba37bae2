"""Template matching: device conv formulation vs the float64 oracle, peak
localization, and the imgproc facade."""

import numpy as np
import pytest

from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.ops import golden
from rustcv_tpu.ops import template as tm


@pytest.fixture()
def scene(rng):
    """A textured scene with the template cut from a known location."""
    img = golden.bgr_to_gray(sim.synth_bgr(160, 120, 7))
    noise = rng.integers(0, 12, size=img.shape, dtype=np.uint8)
    img = np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)
    ty, tx = 41, 88
    tmpl = img[ty : ty + 24, tx : tx + 32].copy()
    return img, tmpl, (tx, ty)


class TestMatchTemplate:
    @pytest.mark.parametrize("method", tm.METHODS)
    def test_device_matches_oracle(self, jax_cpu, scene, method):
        img, tmpl, _ = scene
        want = tm.match_template_numpy(img, tmpl, method)
        got = np.asarray(tm.match_template(img, tmpl, method))
        assert got.shape == want.shape == (120 - 24 + 1, 160 - 32 + 1)
        scale = max(1.0, float(np.abs(want).max()))
        assert np.max(np.abs(got - want)) / scale < 1e-4

    @pytest.mark.parametrize("method", tm.METHODS)
    def test_peak_at_source_location(self, jax_cpu, scene, method):
        img, tmpl, (tx, ty) = scene
        resp = np.asarray(tm.match_template(img, tmpl, method))
        mn, mx, mnloc, mxloc = tm.min_max_loc(resp)
        loc = mnloc if method == "sqdiff" else mxloc
        assert loc == (tx, ty)
        if method == "ccoeff_normed":
            assert mx == pytest.approx(1.0, abs=1e-4)
            assert mx <= 1.0 + 1e-4 and mn >= -1.0 - 1e-4
        if method == "sqdiff":
            # Exact-cut minimum is 0 in exact math; the f32 response is
            # accurate RELATIVE to its scale (ΣT² ~ 1e7 here) — the FFT
            # route's cancellation error at the minimum is ~1e-7 of scale
            # (conv route: ~1e-9). Location above is asserted exact.
            scale = float((tmpl.astype(np.float64) ** 2).sum())
            assert mn <= 1e-6 * scale

    def test_flat_windows_are_zero_not_nan(self, jax_cpu):
        """Zero-variance windows (and a zero-variance template) must yield
        0, never NaN/Inf."""
        img = np.full((40, 50), 128, np.uint8)
        tmpl = np.full((8, 8), 77, np.uint8)
        for method in ("ccoeff_normed", "ccorr_normed"):
            resp = np.asarray(tm.match_template(img, tmpl, method))
            assert np.all(np.isfinite(resp))
        resp = np.asarray(tm.match_template(img, tmpl, "ccoeff_normed"))
        assert np.all(resp == 0.0)

    @pytest.mark.parametrize("method", tm.METHODS)
    def test_fft_route_matches_oracle(self, jax_cpu, rng, method):
        """Templates with area ≥ FFT_AREA_THRESHOLD use the FFT cross-
        correlation — same tolerance contract as the conv route."""
        img = golden.bgr_to_gray(sim.synth_bgr(200, 160, 3))
        noise = rng.integers(0, 12, size=img.shape, dtype=np.uint8)
        img = np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)
        ty, tx = 31, 77
        tmpl = img[ty : ty + 40, tx : tx + 48].copy()  # area 1920 ≥ 1024
        assert tmpl.shape[0] * tmpl.shape[1] >= tm.FFT_AREA_THRESHOLD
        want = tm.match_template_numpy(img, tmpl, method)
        got = np.asarray(tm.match_template(img, tmpl, method))
        scale = max(1.0, float(np.abs(want).max()))
        assert np.max(np.abs(got - want)) / scale < 1e-4
        mn, mx, mnloc, mxloc = tm.min_max_loc(got)
        assert (mnloc if method == "sqdiff" else mxloc) == (tx, ty)

    def test_rejects_unknown_method(self):
        with pytest.raises(ValueError):
            tm.match_template_numpy(np.zeros((8, 8), np.uint8), np.zeros((2, 2), np.uint8), "bogus")

    def test_facade_gray_mats(self, jax_cpu, scene):
        """Single-channel Mats — the primary matchTemplate input — must
        work on both paths (review finding: (H,W,1) crashed bgr_to_gray)."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img, tmpl, (tx, ty) = scene
        resp = imgproc.match_template(Mat.from_array(img), Mat.from_array(tmpl))
        assert imgproc.min_max_loc(resp)[3] == (tx, ty)
        import jax.numpy as jnp

        resp_d = imgproc.match_template(
            Mat.from_device(jnp.asarray(img)), Mat.from_device(jnp.asarray(tmpl))
        )
        assert imgproc.min_max_loc(resp_d)[3] == (tx, ty)

    def test_imgproc_facade(self, jax_cpu, scene):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img, tmpl, (tx, ty) = scene
        bgr = np.repeat(img[..., None], 3, axis=-1)  # gray-as-BGR
        tbgr = np.repeat(tmpl[..., None], 3, axis=-1)
        # host path
        resp = imgproc.match_template(Mat.from_array(bgr), Mat.from_array(tbgr))
        assert imgproc.min_max_loc(resp)[3] == (tx, ty)
        # device path
        import jax.numpy as jnp

        resp_d = imgproc.match_template(
            Mat.from_device(jnp.asarray(bgr)), Mat.from_device(jnp.asarray(tbgr))
        )
        assert imgproc.min_max_loc(resp_d)[3] == (tx, ty)

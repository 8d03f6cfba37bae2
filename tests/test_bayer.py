"""Bayer demosaic: spec sanity, device-vs-golden bit-exactness, and
end-to-end capture of a Bayer stream."""

import numpy as np
import pytest

from rustcv_tpu.capture import Camera, SimulationDriver
from rustcv_tpu.core import Mat, PixelFormat, SimpleConfig
from rustcv_tpu.ops import golden

PATTERNS = ["BGGR", "GBRG", "GRBG", "RGGB"]


class TestGoldenDemosaic:
    @pytest.mark.parametrize("pattern", PATTERNS)
    def test_flat_field_exact(self, pattern):
        """A constant color survives mosaic→demosaic exactly (all neighbor
        averages of a constant are that constant)."""
        bgr = np.tile(np.array([40, 90, 200], np.uint8), (16, 16, 1))
        raw = golden.mosaic_bayer(bgr, pattern)
        out = golden.demosaic_bilinear(raw, pattern)
        np.testing.assert_array_equal(out, bgr)

    @pytest.mark.parametrize("pattern", PATTERNS)
    def test_smooth_gradient_close(self, pattern, rng):
        ys, xs = np.mgrid[0:32, 0:32]
        bgr = np.stack([(ys * 4) % 256, (xs * 4) % 256, ((xs + ys) * 2) % 256], -1).astype(np.uint8)
        raw = golden.mosaic_bayer(bgr, pattern)
        out = golden.demosaic_bilinear(raw, pattern)
        diff = np.abs(out.astype(int) - bgr.astype(int))
        assert np.median(diff) <= 2

    def test_site_channels_preserved(self):
        rng = np.random.default_rng(3)
        bgr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        raw = golden.mosaic_bayer(bgr, "RGGB")
        out = golden.demosaic_bilinear(raw, "RGGB")
        # R at red sites (even, even) passes through untouched
        np.testing.assert_array_equal(out[0::2, 0::2, 2], bgr[0::2, 0::2, 2])
        np.testing.assert_array_equal(out[1::2, 1::2, 0], bgr[1::2, 1::2, 0])


class TestDeviceParity:
    @pytest.mark.parametrize("pattern", PATTERNS)
    def test_bit_exact(self, rng, jax_cpu, pattern):
        from rustcv_tpu.ops import color

        raw = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        want = golden.demosaic_bilinear(raw, pattern)
        got = np.asarray(color.demosaic_bilinear(jax_cpu.numpy.asarray(raw.reshape(-1)), pattern, 64, 48))
        np.testing.assert_array_equal(got, want)

    def test_batched(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        raw = rng.integers(0, 256, (3, 24 * 32), dtype=np.uint8)
        want = np.stack([golden.demosaic_bilinear(r.reshape(24, 32), "GRBG") for r in raw])
        got = np.asarray(color.demosaic_bilinear(jax_cpu.numpy.asarray(raw), "GRBG", 32, 24))
        np.testing.assert_array_equal(got, want)


class TestBayerCapture:
    def test_end_to_end(self, jax_cpu):
        cam = Camera.open_with(
            "sim:0",
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.BAYER_RGGB),
            SimulationDriver(paced=False),
        )
        mat = Mat()
        cam.read_decoded(mat)
        assert mat.shape == (48, 64, 3)
        # device decode matches host oracle bit-exactly
        dev = cam.read_decoded_device()
        from rustcv_tpu.capture import synth_raw

        raw = synth_raw(64, 48, PixelFormat.BAYER_RGGB, 1)
        want = golden.demosaic_bilinear(raw.reshape(48, 64), "RGGB")
        np.testing.assert_array_equal(np.asarray(dev), want)
        cam.close()

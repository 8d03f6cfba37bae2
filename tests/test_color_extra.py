"""Round-3 color-space and bicubic additions: YCrCb both ways, HSV→BGR,
INTER_CUBIC resize — frozen integer specs, device == oracle bit-for-bit."""

import numpy as np
import pytest

from rustcv_tpu.core import Mat
from rustcv_tpu.ops import golden
from rustcv_tpu import imgproc


@pytest.fixture()
def bgr(rng):
    return rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)


class TestYCrCb:
    def test_device_matches_oracle(self, jax_cpu, bgr):
        from rustcv_tpu.ops import color as _color

        want = golden.bgr_to_ycrcb(bgr)
        got = np.asarray(_color.bgr_to_ycrcb(jax_cpu.numpy.asarray(bgr)))
        np.testing.assert_array_equal(got, want)
        back_w = golden.ycrcb_to_bgr(want)
        back_g = np.asarray(_color.ycrcb_to_bgr(jax_cpu.numpy.asarray(want)))
        np.testing.assert_array_equal(back_g, back_w)

    def test_round_trip_close(self, bgr):
        back = golden.ycrcb_to_bgr(golden.bgr_to_ycrcb(bgr))
        # fixed-point chroma quantization: a few LSB per channel
        assert np.abs(back.astype(int) - bgr.astype(int)).max() <= 3

    def test_luma_matches_gray_within_1(self, bgr):
        # The Y plane uses the same 0.299/0.587/0.114 weights as bgr_to_gray
        # (different fixed-point scale → ±1 LSB).
        y = golden.bgr_to_ycrcb(bgr)[..., 0].astype(int)
        g = golden.bgr_to_gray(bgr).astype(int)
        assert np.abs(y - g).max() <= 1

    def test_facade(self, jax_cpu, bgr):
        out = imgproc.cvt_ycrcb(Mat.from_array(bgr))
        np.testing.assert_array_equal(out.to_numpy(), golden.bgr_to_ycrcb(bgr))
        back = imgproc.cvt_ycrcb_to_bgr(out)
        np.testing.assert_array_equal(
            back.to_numpy(), golden.ycrcb_to_bgr(golden.bgr_to_ycrcb(bgr))
        )


class TestHsvToBgr:
    def test_device_matches_oracle(self, jax_cpu, rng):
        from rustcv_tpu.ops import color as _color

        hsv = np.stack(
            [
                rng.integers(0, 180, (40, 56), dtype=np.uint8),
                rng.integers(0, 256, (40, 56), dtype=np.uint8),
                rng.integers(0, 256, (40, 56), dtype=np.uint8),
            ],
            axis=-1,
        )
        want = golden.hsv_to_bgr(hsv)
        got = np.asarray(_color.hsv_to_bgr(jax_cpu.numpy.asarray(hsv)))
        np.testing.assert_array_equal(got, want)

    def test_round_trip(self, bgr):
        back = golden.hsv_to_bgr(golden.bgr_to_hsv(bgr))
        # H quantized to 2 degrees + S/V rounding → small bounded error
        assert np.abs(back.astype(int) - bgr.astype(int)).max() <= 4

    def test_pure_hues(self):
        # Saturated primaries map exactly
        hsv = np.array(
            [[[0, 255, 255], [60, 255, 255], [120, 255, 255]]], np.uint8
        )
        out = golden.hsv_to_bgr(hsv)[0]
        np.testing.assert_array_equal(out[0], [0, 0, 255])    # red
        np.testing.assert_array_equal(out[1], [0, 255, 0])    # green
        np.testing.assert_array_equal(out[2], [255, 0, 0])    # blue

    def test_zero_saturation_is_gray(self):
        hsv = np.array([[[77, 0, 123]]], np.uint8)
        np.testing.assert_array_equal(
            golden.hsv_to_bgr(hsv)[0, 0], [123, 123, 123]
        )


class TestBicubic:
    @pytest.mark.parametrize("shape,dst", [((48, 64, 3), (100, 75)),
                                           ((48, 64, 3), (32, 24)),
                                           ((30, 40), (61, 45))])
    def test_device_matches_oracle(self, jax_cpu, rng, shape, dst):
        from rustcv_tpu.ops import resize as _resize

        img = rng.integers(0, 256, shape, dtype=np.uint8)
        want = golden.resize_bicubic(img, *dst)
        got = np.asarray(_resize.resize_bicubic(jax_cpu.numpy.asarray(img), *dst))
        np.testing.assert_array_equal(got, want)

    def test_flat_is_exact(self, jax_cpu):
        img = np.full((20, 30, 3), 137, np.uint8)
        out = golden.resize_bicubic(img, 47, 33)
        assert (out == 137).all()  # w1 = 2048 − Σothers keeps flats exact

    def test_identity_size(self, rng):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        np.testing.assert_array_equal(golden.resize_bicubic(img, 16, 16), img)

    def test_overshoot_on_edge(self):
        # A step edge upscaled: the negative lobes overshoot past the step
        # level (the defining cubic property — bilinear never exceeds the
        # data range) and clamp within u8.
        img = np.zeros((8, 8), np.uint8)
        img[:, 4:] = 200
        cub = golden.resize_bicubic(img, 32, 8).astype(int)
        bil = golden.resize_bilinear(img[..., None], 32, 8)[..., 0].astype(int)
        assert cub.max() > 200 >= bil.max()
        assert 0 <= cub.min() and cub.max() <= 255

    def test_facade(self, jax_cpu, rng):
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        out = imgproc.resize(Mat.from_array(img), 48, 40, interpolation="cubic")
        np.testing.assert_array_equal(
            out.to_numpy(), golden.resize_bicubic(img, 48, 40)
        )

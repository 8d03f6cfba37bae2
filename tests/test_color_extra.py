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


class TestLab:
    def test_device_within_1lsb(self, jax_cpu, bgr):
        from rustcv_tpu.ops import color as _color

        want = golden.bgr_to_lab(bgr).astype(int)
        got = np.asarray(_color.bgr_to_lab(jax_cpu.numpy.asarray(bgr))).astype(int)
        assert np.abs(got - want).max() <= 1
        lab = golden.bgr_to_lab(bgr)
        back_w = golden.lab_to_bgr(lab).astype(int)
        back_g = np.asarray(_color.lab_to_bgr(jax_cpu.numpy.asarray(lab))).astype(int)
        assert np.abs(back_g - back_w).max() <= 1

    def test_known_values(self):
        white = np.array([[[255, 255, 255]]], np.uint8)
        lw = golden.bgr_to_lab(white)[0, 0]
        assert lw[0] == 255 and abs(int(lw[1]) - 128) <= 1 and abs(int(lw[2]) - 128) <= 1
        black = np.array([[[0, 0, 0]]], np.uint8)
        lb = golden.bgr_to_lab(black)[0, 0]
        assert lb[0] == 0 and lb[1] == 128 and lb[2] == 128
        # mid-gray: L ≈ 53.6% → 137, neutral chroma
        gray = np.array([[[128, 128, 128]]], np.uint8)
        lg = golden.bgr_to_lab(gray)[0, 0]
        assert abs(int(lg[1]) - 128) <= 1 and abs(int(lg[2]) - 128) <= 1

    def test_round_trip(self, bgr):
        back = golden.lab_to_bgr(golden.bgr_to_lab(bgr)).astype(int)
        d = np.abs(back - bgr.astype(int))
        # u8 Lab quantizes a/b to 1.0 and L to 0.39 units; inverting through
        # the cube amplifies that near gamut edges (saturated blues) — same
        # magnitude as OpenCV's 8U Lab round trip. Typical error is ~1 LSB.
        assert d.max() <= 24
        assert d.mean() <= 2.0

    def test_facade(self, jax_cpu, bgr):
        out = imgproc.cvt_lab(Mat.from_array(bgr))
        want = golden.bgr_to_lab(bgr).astype(int)
        assert np.abs(out.to_numpy().astype(int) - want).max() <= 1


class TestMedianK:
    @pytest.mark.parametrize("k", [3, 5, 7])
    def test_device_matches_oracle(self, jax_cpu, rng, k):
        from rustcv_tpu.ops import filters as _filters

        img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        want = golden.median_k(img, k)
        got = np.asarray(_filters.median_u8(jax_cpu.numpy.asarray(img), k))
        np.testing.assert_array_equal(got, want)

    def test_k3_paths_agree(self, jax_cpu, rng):
        from rustcv_tpu.ops import filters as _filters

        img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
        a = np.asarray(_filters.median3_u8(jax_cpu.numpy.asarray(img)))
        b = np.asarray(_filters.median_u8(jax_cpu.numpy.asarray(img), 3))
        np.testing.assert_array_equal(a, b)

    def test_salt_pepper_removal(self, jax_cpu, rng):
        img = np.full((40, 40), 100, np.uint8)
        ys = rng.integers(2, 38, 30)
        xs = rng.integers(2, 38, 30)
        img[ys, xs] = 255
        out = golden.median_k(img, 5)
        assert (out == 100).all()  # sparse impulses vanish under 5x5

    def test_facade_ksize(self, jax_cpu, rng):
        img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        out = imgproc.median_blur(Mat.from_array(img), ksize=5)
        # channel-independent: check one channel vs golden
        np.testing.assert_array_equal(
            out.to_numpy()[..., 1], golden.median_k(img[..., 1], 5)
        )

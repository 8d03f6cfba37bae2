"""Bit-exact parity: device (XLA) kernels vs golden NumPy oracles.

This is the fidelity contract from BASELINE.json ("pixel-exact vs RustCV CPU
output"): golden.py ports the reference's integer arithmetic exactly; every
device kernel must match golden bit-for-bit (Harris: positionally).
Includes the reference's own unit-test anchors (decode.rs:230-273).
"""

import numpy as np
import pytest

from rustcv_tpu.ops import color, draw, features, filters, golden, resize


def _rand_u8(rng, *shape):
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Reference unit-test anchors (rustcv-camera/src/decode.rs:230-273)
# ---------------------------------------------------------------------------


class TestReferenceAnchors:
    def test_yuyv_white(self):
        yuyv = np.array([235, 128, 235, 128], dtype=np.uint8)
        bgr = golden.yuyv_to_bgr(yuyv, 2, 1)
        assert (bgr > 240).all()

    def test_yuyv_black(self):
        yuyv = np.array([16, 128, 16, 128], dtype=np.uint8)
        bgr = golden.yuyv_to_bgr(yuyv, 2, 1)
        assert (bgr < 10).all()

    def test_rgb_to_bgr_swap(self):
        rgb = np.array([255, 0, 0, 0, 255, 0], dtype=np.uint8)
        bgr = golden.rgb_to_bgr(rgb, 2, 1)
        assert bgr.reshape(-1).tolist() == [0, 0, 255, 0, 255, 0]

    def test_yuyv_exact_values(self):
        """Frozen scalar check of the integer BT.601 formula."""
        # Y=100, U=50, V=200: c=84, d=-78, e=72
        # B=(298*84+516*(-78)+128)>>8 = (25032-40248+128)>>8 = -15088>>8 = -59 → 0
        # G=(25032-100*(-78)-208*72+128)>>8 = (25032+7800-14976+128)>>8 = 17984>>8 = 70
        # R=(25032+409*72+128)>>8 = (25032+29448+128)>>8 = 54608>>8 = 213
        yuyv = np.array([100, 50, 100, 200], dtype=np.uint8)
        bgr = golden.yuyv_to_bgr(yuyv, 2, 1)
        assert bgr[0, 0].tolist() == [0, 70, 213]
        assert bgr[0, 1].tolist() == [0, 70, 213]


# ---------------------------------------------------------------------------
# Color conversion parity
# ---------------------------------------------------------------------------


class TestColorParity:
    @pytest.mark.parametrize("w,h", [(64, 48), (640, 480), (130, 37)])
    def test_yuyv(self, rng, jax_cpu, w, h):
        src = _rand_u8(rng, h * w * 2)
        want = golden.yuyv_to_bgr(src, w, h)
        got = np.asarray(color.yuyv_to_bgr(jax_cpu.numpy.asarray(src), w, h))
        np.testing.assert_array_equal(got, want)

    def test_yuyv_batched(self, rng, jax_cpu):
        src = _rand_u8(rng, 4, 32 * 24 * 2)
        want = np.stack([golden.yuyv_to_bgr(s, 32, 24) for s in src])
        got = np.asarray(color.yuyv_to_bgr(jax_cpu.numpy.asarray(src), 32, 24))
        np.testing.assert_array_equal(got, want)

    def test_uyvy(self, rng, jax_cpu):
        src = _rand_u8(rng, 48 * 64 * 2)
        want = golden.uyvy_to_bgr(src, 64, 48)
        got = np.asarray(color.uyvy_to_bgr(jax_cpu.numpy.asarray(src), 64, 48))
        np.testing.assert_array_equal(got, want)

    def test_nv12(self, rng, jax_cpu):
        w, h = 64, 48
        src = _rand_u8(rng, h * w * 3 // 2)
        want = golden.nv12_to_bgr(src, w, h)
        got = np.asarray(color.nv12_to_bgr(jax_cpu.numpy.asarray(src), w, h))
        np.testing.assert_array_equal(got, want)

    def test_bgra(self, rng, jax_cpu):
        w, h = 31, 17
        src = _rand_u8(rng, h * w * 4)
        want = golden.bgra_to_bgr(src, w, h)
        got = np.asarray(color.bgra_to_bgr(jax_cpu.numpy.asarray(src), w, h))
        np.testing.assert_array_equal(got, want)

    def test_rgb(self, rng, jax_cpu):
        w, h = 31, 17
        src = _rand_u8(rng, h * w * 3)
        want = golden.rgb_to_bgr(src, w, h)
        got = np.asarray(color.rgb_to_bgr(jax_cpu.numpy.asarray(src), w, h))
        np.testing.assert_array_equal(got, want)

    def test_rgba(self, rng, jax_cpu):
        w, h = 16, 8
        src = _rand_u8(rng, h * w * 4)
        want = golden.rgba_to_bgr(src, w, h)
        got = np.asarray(color.rgba_to_bgr(jax_cpu.numpy.asarray(src), w, h))
        np.testing.assert_array_equal(got, want)

    def test_gray(self, rng, jax_cpu):
        img = _rand_u8(rng, 37, 53, 3)
        want = golden.bgr_to_gray(img)
        got = np.asarray(color.bgr_to_gray(jax_cpu.numpy.asarray(img)))
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Filters parity
# ---------------------------------------------------------------------------


class TestFilterParity:
    def test_gaussian_gray(self, rng, jax_cpu):
        img = _rand_u8(rng, 64, 96)
        want = golden.gaussian5_u8(img)
        got = np.asarray(filters.gaussian5_u8(jax_cpu.numpy.asarray(img), has_channels=False))
        np.testing.assert_array_equal(got, want)

    def test_gaussian_bgr(self, rng, jax_cpu):
        img = _rand_u8(rng, 33, 47, 3)
        want = golden.gaussian5_u8(img)
        got = np.asarray(filters.gaussian5_u8(jax_cpu.numpy.asarray(img)))
        np.testing.assert_array_equal(got, want)

    def test_gaussian_batched(self, rng, jax_cpu):
        imgs = _rand_u8(rng, 3, 16, 24)
        want = np.stack([golden.gaussian5_u8(i) for i in imgs])
        got = np.asarray(filters.gaussian5_u8(jax_cpu.numpy.asarray(imgs), has_channels=False))
        np.testing.assert_array_equal(got, want)

    def test_sobel(self, rng, jax_cpu):
        img = _rand_u8(rng, 40, 56)
        wx, wy = golden.sobel3_gray(img)
        gx, gy = filters.sobel3_gray(jax_cpu.numpy.asarray(img))
        np.testing.assert_array_equal(np.asarray(gx), wx)
        np.testing.assert_array_equal(np.asarray(gy), wy)

    def test_gradient_magnitude(self, rng, jax_cpu):
        gx = rng.integers(-1020, 1021, size=(33, 44)).astype(np.int32)
        gy = rng.integers(-1020, 1021, size=(33, 44)).astype(np.int32)
        want = golden.gradient_magnitude_u8(gx, gy)
        got = np.asarray(
            filters.gradient_magnitude_u8(jax_cpu.numpy.asarray(gx), jax_cpu.numpy.asarray(gy))
        )
        np.testing.assert_array_equal(got, want)

    def test_fused_blur_sobel(self, rng, jax_cpu):
        img = _rand_u8(rng, 48, 64, 3)
        want = golden.blur_sobel_mag_u8(img)
        got = np.asarray(filters.blur_sobel_mag_u8(jax_cpu.numpy.asarray(img)))
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Resize parity
# ---------------------------------------------------------------------------


class TestResizeParity:
    @pytest.mark.parametrize(
        "src,dst",
        [((480, 640), (480, 640)), ((480, 640), (240, 320)), ((48, 64), (100, 150)),
         ((37, 53), (20, 28)), ((4, 4), (7, 9))],
    )
    def test_bilinear(self, rng, jax_cpu, src, dst):
        img = _rand_u8(rng, src[0], src[1], 3)
        want = golden.resize_bilinear(img, dst[1], dst[0])
        got = np.asarray(resize.resize_bilinear(jax_cpu.numpy.asarray(img), dst[1], dst[0]))
        np.testing.assert_array_equal(got, want)

    def test_identity(self, rng, jax_cpu):
        img = _rand_u8(rng, 16, 16, 3)
        got = np.asarray(resize.resize_bilinear(jax_cpu.numpy.asarray(img), 16, 16))
        np.testing.assert_array_equal(got, img)

    @pytest.mark.parametrize(
        "src,dst",
        [((48, 64), (24, 32)), ((48, 64), (96, 128)), ((40, 100), (20, 48)),
         ((1080, 1920), (480, 640))],
    )
    def test_packed_rows_bit_exact(self, rng, jax_cpu, src, dst):
        """Plane-form packed-rows resize ≡ golden on the HWC view, incl.
        batched; both widths 4-aligned (the packed gate's condition)."""
        img = _rand_u8(rng, src[0], src[1], 3)
        want = golden.resize_bilinear(img, dst[1], dst[0])
        packed = np.ascontiguousarray(img.reshape(src[0], src[1] * 3))
        got = np.asarray(
            resize.resize_bilinear_packed(
                jax_cpu.numpy.asarray(packed), src[1], src[0], dst[1], dst[0]
            )
        )
        np.testing.assert_array_equal(got.reshape(dst[0], dst[1], 3), want)

    def test_packed_batched(self, rng, jax_cpu):
        imgs = _rand_u8(rng, 3, 48, 64, 3)
        packed = np.ascontiguousarray(imgs.reshape(3, 48, 64 * 3))
        got = np.asarray(resize.resize_bilinear_packed(packed, 64, 48, 32, 24))
        for i in range(3):
            np.testing.assert_array_equal(
                got[i].reshape(24, 32, 3), golden.resize_bilinear(imgs[i], 32, 24)
            )

    @pytest.mark.parametrize("dst", [(24, 32), (12, 16), (20, 40), (60, 100)])
    def test_nearest_bit_exact(self, rng, jax_cpu, dst):
        img = _rand_u8(rng, 48, 64, 3)
        want = golden.resize_nearest(img, dst[1], dst[0])
        got = np.asarray(resize.resize_nearest(jax_cpu.numpy.asarray(img), dst[1], dst[0]))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("dst", [(24, 32), (12, 16), (6, 8), (20, 40)])
    def test_area_bit_exact(self, rng, jax_cpu, dst):
        """Integer factors take the exact box mean; (20, 40) is a
        non-integer height factor → bilinear fallback on both sides."""
        img = _rand_u8(rng, 48, 64, 3)
        want = golden.resize_area(img, dst[1], dst[0])
        got = np.asarray(resize.resize_area(jax_cpu.numpy.asarray(img), dst[1], dst[0]))
        np.testing.assert_array_equal(got, want)

    def test_area_is_exact_box_mean(self, jax_cpu):
        img = np.full((4, 4, 1), 10, np.uint8)
        img[:2, :2] = 11  # mean of {11,11,11,11,10..} per 2x2
        out = golden.resize_area(img, 2, 2)
        assert out[0, 0, 0] == 11 and out[1, 1, 0] == 10

    def test_imgproc_resize_modes(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _rand_u8(rng, 48, 64, 3)
        for mode, fn in (
            ("bilinear", golden.resize_bilinear),
            ("nearest", golden.resize_nearest),
            ("area", golden.resize_area),
            ("cubic", golden.resize_bicubic),
        ):
            out = imgproc.resize(Mat.from_array(img), 16, 12, interpolation=mode)
            np.testing.assert_array_equal(out.to_numpy(), fn(img, 16, 12))
        with pytest.raises(ValueError):
            imgproc.resize(Mat.from_array(img), 16, 12, interpolation="lanczos9")

    @pytest.mark.parametrize("h,w", [(48, 64), (47, 63)])  # odd dims too
    def test_pyr_down_bit_exact(self, rng, jax_cpu, h, w):
        from rustcv_tpu.ops import filters

        img = _rand_u8(rng, h, w, 3)
        want = golden.pyr_down(img)
        assert want.shape == (-(-h // 2), -(-w // 2), 3)
        got = np.asarray(filters.pyr_down(jax_cpu.numpy.asarray(img)))
        np.testing.assert_array_equal(got, want)
        # gray + batched
        gray = img[..., 0]
        np.testing.assert_array_equal(
            np.asarray(filters.pyr_down(jax_cpu.numpy.asarray(gray))),
            golden.pyr_down(gray),
        )

    def test_imgproc_pyr_down(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _rand_u8(rng, 48, 64, 3)
        out = imgproc.pyr_down(Mat.from_array(img))
        np.testing.assert_array_equal(out.to_numpy(), golden.pyr_down(img))

    def test_hsv_bit_exact(self, rng, jax_cpu):
        from rustcv_tpu.ops import color as col

        bgr = _rand_u8(rng, 97, 131, 3)
        # adversarial rows: grays (diff=0), zeros, primaries, channel ties
        bgr[0] = np.repeat(np.arange(131, dtype=np.uint8)[:, None], 3, axis=1)
        bgr[1, :6] = [(0, 0, 255), (0, 255, 0), (255, 0, 0),
                      (0, 255, 255), (255, 255, 0), (255, 0, 255)]
        bgr[2, :3] = [(10, 200, 200), (200, 10, 200), (200, 200, 10)]  # ties
        want = golden.bgr_to_hsv(bgr)
        got = np.asarray(col.bgr_to_hsv(jax_cpu.numpy.asarray(bgr)))
        np.testing.assert_array_equal(got, want)
        # OpenCV primaries: red 0, green 60, blue 120, yellow 30, cyan 90,
        # magenta 150
        np.testing.assert_array_equal(want[1, :6, 0], [0, 60, 120, 30, 90, 150])
        assert want[..., 2].max() <= 255 and want[..., 0].max() < 180

    def test_in_range_and_moments(self, rng, jax_cpu):
        from rustcv_tpu.ops import color as col

        img = _rand_u8(rng, 64, 80, 3)
        want = golden.in_range(img, (20, 40, 60), (200, 220, 240))
        got = np.asarray(col.in_range(jax_cpu.numpy.asarray(img), (20, 40, 60), (200, 220, 240)))
        np.testing.assert_array_equal(got, want)
        gm = golden.moments(want)
        dm = col.moments(jax_cpu.numpy.asarray(want))
        assert gm == dm

    def test_moments_no_overflow_at_4k(self, jax_cpu):
        """Full-255 4K mask: m10 ≈ 2^45 — the per-row-partial design must
        stay exact where a flat int32 reduction would overflow."""
        from rustcv_tpu.ops import color as col

        mask = np.full((2160, 3840), 255, np.uint8)
        dm = col.moments(jax_cpu.numpy.asarray(mask))
        gm = golden.moments(mask)
        assert dm == gm
        assert dm["m10"] == 255 * 2160 * (3840 * 3839 // 2)

    def test_color_tracking_flow(self, jax_cpu):
        """hsv → in_range → moments centroid finds a colored square."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        bgr = np.zeros((96, 128, 3), np.uint8)
        bgr[30:50, 70:90] = (0, 0, 255)  # red square at (80, 40) center
        mat = Mat.from_array(bgr)
        hsv = imgproc.cvt_hsv(mat)
        # red: H near 0 (or wrap ~179), strong S/V
        mask = imgproc.in_range(hsv, (0, 100, 100), (10, 255, 255))
        m = imgproc.moments(mask)
        cx, cy = m["centroid"]
        assert abs(cx - 79.5) < 1.0 and abs(cy - 39.5) < 1.0
        # device path agrees
        mat_d = Mat.from_device(jax_cpu.numpy.asarray(bgr))
        hsv_d = imgproc.cvt_hsv(mat_d)
        mask_d = imgproc.in_range(hsv_d, (0, 100, 100), (10, 255, 255))
        assert imgproc.moments(mask_d) == m
        np.testing.assert_array_equal(mask_d.to_numpy(), mask.to_numpy())

    def test_hist_and_equalize_bit_exact(self, rng, jax_cpu):
        from rustcv_tpu.ops import hist as _hist

        gray = _rand_u8(rng, 123, 177, 3)[..., 0]
        want_h = _hist.calc_hist_numpy(gray)
        got_h = np.asarray(_hist.calc_hist(jax_cpu.numpy.asarray(gray)))
        np.testing.assert_array_equal(got_h, want_h)
        assert got_h.sum() == gray.size
        want = _hist.equalize_hist_numpy(gray)
        got = np.asarray(_hist.equalize_hist(jax_cpu.numpy.asarray(gray)))
        np.testing.assert_array_equal(got, want)
        # equalization spreads a narrow-range image to the full range
        narrow = (gray // 4 + 96).astype(np.uint8)
        eq = _hist.equalize_hist_numpy(narrow)
        assert eq.min() == 0 and eq.max() == 255

    def test_equalize_constant_image_identity(self, jax_cpu):
        from rustcv_tpu.ops import hist as _hist

        flat = np.full((32, 40), 77, np.uint8)
        np.testing.assert_array_equal(_hist.equalize_hist_numpy(flat), flat)
        np.testing.assert_array_equal(
            np.asarray(_hist.equalize_hist(jax_cpu.numpy.asarray(flat))), flat
        )

    def test_moments_wide_mask_exact(self, jax_cpu):
        """W > 4096 falls back to the exact host path (the int32 row
        partial would overflow — review finding)."""
        from rustcv_tpu.ops import color as col

        mask = np.full((8, 5120), 255, np.uint8)
        dm = col.moments(jax_cpu.numpy.asarray(mask))
        gm = golden.moments(mask)
        assert dm == gm
        assert dm["m10"] == 255 * 8 * (5120 * 5119 // 2)

    def test_equalize_large_image_exact(self, jax_cpu):
        """Above the int32 LUT bound the host-LUT fallback must stay
        bit-exact (device 510·cdf would overflow — review finding)."""
        from rustcv_tpu.ops import hist as _hist

        rng = np.random.default_rng(5)
        gray = rng.integers(0, 256, size=(3000, 3000), dtype=np.uint8)  # 9M px
        want = _hist.equalize_hist_numpy(gray)
        got = np.asarray(_hist.equalize_hist(jax_cpu.numpy.asarray(gray)))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("w,h,grid", [(160, 120, (8, 8)), (130, 54, (4, 4))])
    def test_clahe_bit_exact(self, jax_cpu, w, h, grid):
        from rustcv_tpu.capture import simulation as sim
        from rustcv_tpu.ops import hist as _hist

        gray = golden.bgr_to_gray(sim.synth_bgr(w, h, 3))
        want = _hist.clahe_numpy(gray, 40, grid)
        got = np.asarray(_hist.clahe(gray, 40, grid))
        np.testing.assert_array_equal(got, want)

    def test_clahe_clip_limits_contrast(self, rng, jax_cpu):
        """Low clip → bounded amplification; huge clip ≈ per-tile equalize."""
        from rustcv_tpu.ops import hist as _hist

        flatish = np.clip(rng.normal(128, 3, (120, 160)), 0, 255).astype(np.uint8)
        tight = _hist.clahe_numpy(flatish, clip_limit=2)
        loose = _hist.clahe_numpy(flatish, clip_limit=1000)
        assert (tight.max() - tight.min()) < 80
        assert (loose.max() - loose.min()) > 200

    def test_imgproc_clahe_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.capture import simulation as sim
        from rustcv_tpu.core.mat import Mat
        from rustcv_tpu.ops import hist as _hist

        gray = golden.bgr_to_gray(sim.synth_bgr(96, 64, 7))
        want = _hist.clahe_numpy(gray)
        np.testing.assert_array_equal(
            imgproc.clahe(Mat.from_array(gray)).to_numpy().squeeze(), want
        )
        import jax.numpy as jnp

        np.testing.assert_array_equal(
            imgproc.clahe(Mat.from_device(jnp.asarray(gray))).to_numpy().squeeze(),
            want,
        )
        with pytest.raises(ValueError):
            imgproc.clahe(Mat.from_array(sim.synth_bgr(16, 16, 0)))

    @pytest.mark.parametrize("method,block", [("mean", 11), ("mean", 5), ("gaussian", 5)])
    @pytest.mark.parametrize("inv", [False, True])
    def test_adaptive_threshold_exact(self, rng, jax_cpu, method, block, inv):
        from rustcv_tpu.ops import filters

        gray = _rand_u8(rng, 57, 83, 3)[..., 0]
        want = golden.adaptive_threshold(gray, 255, method, block, 2, inv)
        got = np.asarray(
            filters.adaptive_threshold_u8(gray, 255, method, block, 2, inv)
        )
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("sigma", [10, 25, 60])
    def test_bilateral_exact_and_edge_preserving(self, rng, jax_cpu, sigma):
        from rustcv_tpu.ops import filters

        gray = _rand_u8(rng, 48, 64, 3)[..., 0]
        want = golden.bilateral5_u8(gray, sigma)
        got = np.asarray(filters.bilateral5_u8(gray, sigma))
        np.testing.assert_array_equal(got, want)
        # step edge survives better than under the Gaussian
        step = np.zeros((40, 60), np.uint8)
        step[:, 30:] = 200
        noisy = np.clip(
            step.astype(np.int32) + rng.integers(-12, 13, step.shape), 0, 255
        ).astype(np.uint8)
        bi = golden.bilateral5_u8(noisy, 20)
        ga = golden.gaussian5_u8(noisy)
        e_bi = np.abs(bi[:, 31].astype(int) - bi[:, 28].astype(int)).mean()
        e_ga = np.abs(ga[:, 31].astype(int) - ga[:, 28].astype(int)).mean()
        assert e_bi > e_ga

    def test_imgproc_adaptive_bilateral_facades(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        gray = _rand_u8(rng, 32, 48, 3)[..., 0]
        m = Mat.from_array(gray)
        np.testing.assert_array_equal(
            imgproc.adaptive_threshold(m).to_numpy().squeeze(),
            golden.adaptive_threshold(gray),
        )
        np.testing.assert_array_equal(
            imgproc.bilateral_filter(m).to_numpy().squeeze(),
            golden.bilateral5_u8(gray),
        )

    def test_apply_lut_exact(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat
        from rustcv_tpu.ops import hist as _hist

        img = _rand_u8(rng, 33, 47, 3)
        table = rng.permutation(256).astype(np.uint8)
        want = table[img]
        got = np.asarray(_hist.apply_lut(jax_cpu.numpy.asarray(img), table))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            imgproc.lut(Mat.from_array(img), table).to_numpy(), want
        )

    def test_imgproc_hist_facade(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat
        from rustcv_tpu.ops import hist as _hist

        gray = _rand_u8(rng, 48, 64, 3)[..., 0]
        m = Mat.from_array(gray)
        np.testing.assert_array_equal(imgproc.calc_hist(m), _hist.calc_hist_numpy(gray))
        np.testing.assert_array_equal(
            imgproc.equalize_hist(m).to_numpy().squeeze(),
            _hist.equalize_hist_numpy(gray),
        )
        md = Mat.from_device(jax_cpu.numpy.asarray(gray))
        np.testing.assert_array_equal(
            imgproc.equalize_hist(md).to_numpy().squeeze(),
            _hist.equalize_hist_numpy(gray),
        )
        with pytest.raises(ValueError):
            imgproc.equalize_hist(Mat.from_array(_rand_u8(rng, 8, 8, 3)))

    def test_unpack_interleave_roundtrip(self, rng, jax_cpu):
        from rustcv_tpu.ops import color as col

        img = _rand_u8(rng, 12, 16, 3)
        packed = np.ascontiguousarray(img.reshape(12, 48))
        b, g, r = col.unpack_bgr_planes(jax_cpu.numpy.asarray(packed), 16, 12)
        np.testing.assert_array_equal(np.asarray(b), img[..., 0].astype(np.int32))
        np.testing.assert_array_equal(np.asarray(r), img[..., 2].astype(np.int32))
        back = np.asarray(col.interleave_bgr_planes(b, g, r, 16, 12))
        np.testing.assert_array_equal(back, packed)


# ---------------------------------------------------------------------------
# Drawing parity
# ---------------------------------------------------------------------------


class TestDrawParity:
    @pytest.mark.parametrize(
        "rect,th",
        [((5, 5, 20, 12), 1), ((5, 5, 20, 12), 3), ((-4, -6, 15, 15), 2),
         ((25, 20, 100, 100), 2), ((3, 3, 8, 8), 20)],  # over-thick: overdraw path
    )
    def test_rectangle(self, rng, jax_cpu, rect, th):
        img = _rand_u8(rng, 32, 40, 3)
        want = img.copy()
        golden.rectangle(want.reshape(32, -1), 32, 40, 40 * 3, rect, (9, 99, 199), th)
        got = np.asarray(
            draw.rectangle(
                jax_cpu.numpy.asarray(img),
                jax_cpu.numpy.asarray(rect, dtype=np.int32),
                jax_cpu.numpy.asarray([9, 99, 199], dtype=np.uint8),
                th,
            )
        )
        np.testing.assert_array_equal(got, want.reshape(32, 40, 3))

    def test_golden_stride_bleed_quirk(self, rng):
        """Document the reference's flat-index quirk (drawing.rs:83-88): when
        thickness pushes an edge column past ``cols``, writes bleed into the
        next row's start. The device kernel clips instead (see ops/draw.py);
        this test pins the oracle's faithful emulation of the quirk."""
        img = _rand_u8(rng, 32, 40, 3)
        before = img.copy()
        golden.rectangle(img.reshape(32, -1), 32, 40, 40 * 3, (3, 3, 8, 8), (1, 2, 3), 50)
        # Row 4 (y_min+1) begins with bled pixels from row 3's c=40..52 writes
        changed_next_row_head = (img[4, :13] != before[4, :13]).any()
        assert changed_next_row_head

    def test_rectangle_degenerate(self, rng, jax_cpu):
        img = _rand_u8(rng, 16, 16, 3)
        got = np.asarray(
            draw.rectangle(
                jax_cpu.numpy.asarray(img),
                jax_cpu.numpy.asarray([20, 20, 5, 5], dtype=np.int32),
                jax_cpu.numpy.asarray([1, 2, 3], dtype=np.uint8),
                1,
            )
        )
        np.testing.assert_array_equal(got, img)  # fully clipped = no-op

    def test_blend_mask(self, rng, jax_cpu):
        img = _rand_u8(rng, 40, 60, 3)
        mask = _rand_u8(rng, 8, 16)
        for x0, y0 in [(5, 7), (-3, -2), (55, 35), (100, 100)]:
            want = img.copy()
            golden.blend_mask(want, mask, x0, y0, (200, 100, 50))
            got = np.asarray(
                draw.blend_mask_at(
                    jax_cpu.numpy.asarray(img),
                    jax_cpu.numpy.asarray(mask),
                    x0, y0,
                    jax_cpu.numpy.asarray([200, 100, 50], dtype=np.int32),
                )
            )
            np.testing.assert_array_equal(got, want, err_msg=f"at ({x0},{y0})")


# ---------------------------------------------------------------------------
# Harris (positional parity)
# ---------------------------------------------------------------------------


def _checkerboard(h, w, sq):
    ys, xs = np.mgrid[0:h, 0:w]
    return (((ys // sq) + (xs // sq)) % 2 * 255).astype(np.uint8)


class TestHarrisParity:
    def test_response_close(self, jax_cpu):
        img = _checkerboard(64, 64, 8)
        want = golden.harris_response(img)
        got = np.asarray(features.harris_response(jax_cpu.numpy.asarray(img)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_response_i32_bit_exact(self, jax_cpu):
        for img in (_checkerboard(64, 64, 8), _checkerboard(48, 80, 5)):
            want = golden.harris_response_i32(img)
            got = np.asarray(features.harris_response_i32(jax_cpu.numpy.asarray(img)))
            np.testing.assert_array_equal(got, want)

    def test_corners_bit_exact(self, jax_cpu):
        img = _checkerboard(64, 64, 8)
        want = golden.harris_corners(img)
        got = np.asarray(features.harris_corners(jax_cpu.numpy.asarray(img)))
        # fixed-point spec: masks are ARRAY-EQUAL, no tie tolerance
        np.testing.assert_array_equal(got, want)
        # interior corners of a checkerboard must all be found
        assert got[8:-8, 8:-8].sum() >= 40

    def test_corners_bit_exact_nondefault_params(self, jax_cpu):
        img = _checkerboard(48, 80, 5)
        want = golden.harris_corners(img, k=0.06, threshold_rel=0.02, nms_radius=2)
        got = np.asarray(
            features.harris_corners(
                jax_cpu.numpy.asarray(img), k=0.06, threshold_rel=0.02, nms_radius=2
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_corner_list(self, jax_cpu):
        img = _checkerboard(64, 64, 8)
        coords, valid = features.harris_corner_list(jax_cpu.numpy.asarray(img), max_corners=128)
        coords, valid = np.asarray(coords), np.asarray(valid)
        mask = golden.harris_corners(img)
        n_valid = valid.sum()
        assert n_valid > 0
        # fixed-point spec: every listed corner is exactly a golden corner
        hits = sum(bool(mask[y, x]) for (y, x) in coords[valid][: int(n_valid)])
        assert hits == n_valid


class TestDrawLineCircle:
    def test_line_packed_bit_exact(self, rng, jax_cpu):
        from rustcv_tpu.ops import draw

        packed = np.zeros((40, 180), np.uint8)
        for p1, p2, t in [((5, 5), (50, 30), 3), ((10, 10), (10, 10), 4),
                          ((58, 2), (3, 38), 7), ((-4000, -2000), (4000, 2100), 5)]:
            out = np.asarray(
                draw.line_packed(packed, p1, p2, (255, 10, 20), t)
            ).reshape(40, 60, 3)
            mask = golden.line_mask(40, 60, p1, p2, t)
            want = np.zeros((40, 60, 3), np.uint8)
            want[mask > 0] = (255, 10, 20)
            np.testing.assert_array_equal(out, want)

    def test_circle_packed_bit_exact(self, jax_cpu):
        from rustcv_tpu.ops import draw

        packed = np.zeros((40, 180), np.uint8)
        for r, t in [(12, 2), (12, -1), (5, 1)]:
            out = np.asarray(
                draw.circle_packed(packed, (30, 20), r, (0, 255, 0), t)
            ).reshape(40, 60, 3)
            mask = golden.circle_mask(40, 60, (30, 20), r, t)
            want = np.zeros((40, 60, 3), np.uint8)
            want[mask > 0] = (0, 255, 0)
            np.testing.assert_array_equal(out, want)

    def test_batched_lines(self, jax_cpu):
        from rustcv_tpu.ops import draw

        b = np.zeros((2, 40, 180), np.uint8)
        p1 = np.array([[5, 5], [0, 0]], np.int32)
        p2 = np.array([[50, 30], [59, 39]], np.int32)
        cols = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
        ob = np.asarray(draw.line_packed(b, p1, p2, cols, np.int32(2)))
        for i in range(2):
            mask = golden.line_mask(40, 60, tuple(p1[i]), tuple(p2[i]), 2)
            want = np.zeros((40, 60, 3), np.uint8)
            want[mask > 0] = cols[i]
            np.testing.assert_array_equal(ob[i].reshape(40, 60, 3), want)

    def test_imgproc_line_circle_polylines(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat
        from rustcv_tpu.imgproc import Point, Scalar

        import jax.numpy as jnp

        base = np.zeros((40, 60, 3), np.uint8)
        mh = Mat.from_array(base.copy())
        md = Mat.from_device(jnp.asarray(base))
        for m in (mh, md):
            imgproc.line(m, Point(5, 5), Point(50, 30), Scalar(255, 10, 20), 3)
            imgproc.circle(m, Point(30, 20), 10, Scalar(0, 255, 0), 2)
            imgproc.polylines(
                m, [(2, 2), (20, 2), (20, 15)], Scalar(0, 0, 255), 1, closed=True
            )
        np.testing.assert_array_equal(mh.to_numpy(), md.to_numpy())
        assert (mh.to_numpy() != 0).any()


class TestBackProjection:
    def test_separates_object_from_background(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat
        from rustcv_tpu.ops import hist as _hist

        img = np.zeros((60, 80, 3), np.uint8)
        img[:, :] = (0, 200, 0)          # green background
        img[20:40, 30:60] = (0, 0, 220)  # red object
        hsv = imgproc.cvt_hsv(Mat.from_array(img))
        model = imgproc.calc_hue_hist(
            Mat.from_array(hsv.to_numpy()[20:40, 30:60])
        )
        bp = imgproc.back_project(hsv, model).to_numpy().squeeze()
        assert bp[20:40, 30:60].mean() > 250
        assert bp[:15].mean() < 5
        # mean-shift style: the weight image's centroid is the object
        from rustcv_tpu.ops import golden

        mm = golden.moments(bp)
        cx, cy = mm["centroid"]
        assert abs(cx - 44.5) < 1.0 and abs(cy - 29.5) < 1.0

    def test_empty_model(self, jax_cpu):
        from rustcv_tpu.ops import hist as _hist

        hsv = np.zeros((10, 10, 3), np.uint8)
        bp = _hist.back_project_hue(hsv, np.zeros(180))
        assert (bp == 0).all()


class TestMeanShift:
    def test_converges_to_blob(self, jax_cpu):
        from rustcv_tpu.ops import hist as _hist

        prob = np.zeros((60, 80), np.uint8)
        prob[20:40, 30:60] = 255
        it, (x, y, w, h) = _hist.mean_shift(prob, (5, 5, 28, 18))
        cx, cy = x + (w - 1) / 2, y + (h - 1) / 2
        assert abs(cx - 44.5) < 1.5 and abs(cy - 29.5) < 1.5
        # empty weight image: window unchanged
        it2, win2 = _hist.mean_shift(np.zeros((30, 30), np.uint8), (3, 4, 8, 8))
        assert win2 == (3, 4, 8, 8)

    def test_cam_shift_resizes(self, jax_cpu):
        from rustcv_tpu.ops import hist as _hist

        prob = np.zeros((60, 80), np.uint8)
        prob[20:40, 30:60] = 255
        (cx, cy, w, h), _ = _hist.cam_shift(prob, (5, 5, 28, 18))
        assert abs(cx - 45) < 3 and abs(cy - 30) < 3
        assert w > 28  # grew toward the blob's mass

    def test_full_color_tracking_flow(self, jax_cpu):
        """hsv → backproject → camshift finds and sizes a colored blob."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = np.zeros((60, 80, 3), np.uint8)
        img[:, :] = (0, 200, 0)
        img[20:40, 30:60] = (0, 0, 220)
        hsv = imgproc.cvt_hsv(Mat.from_array(img))
        model = imgproc.calc_hue_hist(Mat.from_array(hsv.to_numpy()[20:40, 30:60]))
        bp = imgproc.back_project(hsv, model)
        # the start window must OVERLAP the target (meanShift semantics,
        # as in OpenCV) — (5, 5, 28, 18) clips the blob's corner
        (cx, cy, w, h), _ = imgproc.cam_shift(bp, (5, 5, 28, 18))
        assert abs(cx - 44.5) < 4 and abs(cy - 29.5) < 4


class TestLaplacianScharr:
    def test_laplacian_exact(self, rng, jax_cpu):
        g = _rand_u8(rng, 37, 53, 3)[..., 0]
        np.testing.assert_array_equal(
            np.asarray(filters.laplacian3(g)), golden.laplacian3(g)
        )

    def test_scharr_exact(self, rng, jax_cpu):
        g = _rand_u8(rng, 40, 56, 3)[..., 0]
        wx, wy = golden.scharr3_gray(g)
        dx, dy = filters.scharr3_gray(g)
        np.testing.assert_array_equal(np.asarray(dx), wx)
        np.testing.assert_array_equal(np.asarray(dy), wy)
        # a vertical step edge: gx strong, gy zero (interior rows)
        step = np.zeros((20, 20), np.uint8)
        step[:, 10:] = 200
        gx, gy = golden.scharr3_gray(step)
        assert np.abs(gx[5:15, 9:11]).max() == 3200  # 16*200
        assert np.abs(gy[5:15]).max() == 0


class TestReviewRegressions2:
    def test_backproject_16bin_model(self, jax_cpu):
        """16-bin hue models (the common OpenCV usage) map via
        bin = hue*nbins//180 — must not crash (review finding)."""
        from rustcv_tpu.ops import hist as _hist

        hsv = np.zeros((10, 12, 3), np.uint8)
        hsv[..., 0] = 5  # hue 5 → bin 0 of 16
        model = np.zeros(16)
        model[0] = 1.0
        bp = _hist.back_project_hue(hsv, model)
        assert (bp == 255).all()

    def test_mean_shift_zero_iters_clamps(self, jax_cpu):
        from rustcv_tpu.ops import hist as _hist

        _, (x, y, w, h) = _hist.mean_shift(
            np.ones((20, 20), np.uint8), (-5, 50, 8, 8), max_iter=0
        )
        assert 0 <= x <= 20 - w and 0 <= y <= 20 - h

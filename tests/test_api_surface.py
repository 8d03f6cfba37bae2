"""Public API surface tests: imgproc / highgui / imgcodecs / prelude /
models — the facade a reference user migrates to."""

import os

import numpy as np
import pytest

from rustcv_tpu import imgcodecs, imgproc
from rustcv_tpu import highgui
from rustcv_tpu.core import Mat, PixelFormat
from rustcv_tpu.imgproc import Point, Rect, Scalar
from rustcv_tpu.ops import golden


def _rand_mat(rng, h=32, w=40):
    return Mat.from_array(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


class TestImgproc:
    def test_rectangle_host_inplace(self, rng):
        m = _rand_mat(rng)
        want = m.to_numpy()
        imgproc.rectangle(m, Rect(5, 5, 20, 12), Scalar(9, 99, 199), 2)
        golden.rectangle(want.reshape(32, -1), 32, 40, 120, (5, 5, 20, 12), (9, 99, 199), 2)
        np.testing.assert_array_equal(m.to_numpy(), want.reshape(32, 40, 3))

    def test_rectangle_device_stays_on_device(self, rng, jax_cpu):
        m = _rand_mat(rng)
        ref = m.to_numpy()
        dm = Mat.from_device(jax_cpu.device_put(ref))
        imgproc.rectangle(dm, Rect(5, 5, 20, 12), Scalar(1, 2, 3), 1)
        assert dm.is_on_device
        want = ref.copy()
        golden.rectangle(want.reshape(32, -1), 32, 40, 120, (5, 5, 20, 12), (1, 2, 3), 1)
        np.testing.assert_array_equal(dm.to_numpy(), want.reshape(32, 40, 3))

    def test_put_text_host_device_match(self, rng, jax_cpu):
        m1 = _rand_mat(rng, 64, 256)
        base = m1.to_numpy()
        m2 = Mat.from_device(jax_cpu.device_put(base))
        imgproc.put_text(m1, "FPS 60.0", Point(10, 40), 1.0, Scalar(0, 255, 0))
        imgproc.put_text(m2, "FPS 60.0", Point(10, 40), 1.0, Scalar(0, 255, 0))
        np.testing.assert_array_equal(m1.to_numpy(), m2.to_numpy())
        assert (m1.to_numpy() != base).any()  # something rendered

    def test_scalar_helpers(self):
        assert Scalar.all(7) == Scalar(7, 7, 7)
        assert Scalar.new(1, 2, 3).bgr == (1, 2, 3)

    def test_resize_and_filters(self, rng, jax_cpu):
        m = _rand_mat(rng, 48, 64)
        small = imgproc.resize(m, 32, 24)
        assert small.shape == (24, 32, 3)
        np.testing.assert_array_equal(
            small.to_numpy(), golden.resize_bilinear(m.to_numpy(), 32, 24)
        )
        g = imgproc.cvt_gray(m)
        assert g.shape == (48, 64, 1)
        blurred = imgproc.gaussian_blur(m)
        np.testing.assert_array_equal(blurred.to_numpy(), golden.gaussian5_u8(m.to_numpy()))
        mag = imgproc.sobel_magnitude(m)
        assert mag.shape == (48, 64, 1)

    def test_harris_api(self, jax_cpu):
        ys, xs = np.mgrid[0:64, 0:64]
        board = (((ys // 8) + (xs // 8)) % 2 * 255).astype(np.uint8)
        m = Mat.from_array(np.repeat(board[..., None], 3, axis=2))
        mask = imgproc.harris_corners(m)
        assert mask.shape == (64, 64)
        assert mask.sum() > 10


class TestHighgui:
    def test_imshow_and_framebuffer(self, rng):
        m = _rand_mat(rng)
        highgui.imshow("test-win", m)
        fb = highgui.get_window_frame("test-win")
        np.testing.assert_array_equal(fb, m.to_numpy())
        assert "test-win" in highgui.window_names()
        highgui.destroy_all_windows()
        assert highgui.get_window_frame("test-win") is None

    def test_u32_packing(self):
        m = Mat.from_array(np.array([[[1, 2, 3]]], dtype=np.uint8))  # B=1 G=2 R=3
        buf = highgui.mat_to_u32_buffer(m)
        assert buf[0, 0] == (3 << 16) | (2 << 8) | 1

    def test_wait_key_injection(self):
        highgui.push_key(highgui.KEY_SPACE)
        assert highgui.wait_key(1) == 32
        assert highgui.wait_key(1) == -1

    def test_display_dir_sink(self, rng, tmp_path):
        os.environ["RUSTCV_TPU_DISPLAY_DIR"] = str(tmp_path)
        try:
            highgui.imshow("sink", _rand_mat(rng))
            assert (tmp_path / "sink.png").exists()
        finally:
            del os.environ["RUSTCV_TPU_DISPLAY_DIR"]
        highgui.destroy_all_windows()


class TestImgcodecs:
    def test_roundtrip_png(self, rng, tmp_path):
        m = _rand_mat(rng)
        path = str(tmp_path / "x.png")
        assert imgcodecs.imwrite(path, m)
        back = imgcodecs.imread(path)
        np.testing.assert_array_equal(back.to_numpy(), m.to_numpy())

    def test_strided_mat_write(self, rng, tmp_path):
        # imwrite must honor step (imgcodecs/mod.rs:39-76)
        m = Mat.new(8, 10, 3, step=64)
        m.array[:] = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
        path = str(tmp_path / "s.png")
        assert imgcodecs.imwrite(path, m)
        back = imgcodecs.imread(path)
        np.testing.assert_array_equal(back.to_numpy(), m.to_numpy())

    def test_imread_missing(self):
        from rustcv_tpu.core import CameraError

        with pytest.raises(CameraError):
            imgcodecs.imread("/nonexistent/file.png")

    def test_imwrite_empty(self):
        assert not imgcodecs.imwrite("/tmp/never.png", Mat.empty())


class TestPrelude:
    def test_imports(self):
        from rustcv_tpu.prelude import Camera, Mat, TickMeter, VideoCapture  # noqa: F401


class TestModels:
    def test_zoo_listing(self):
        from rustcv_tpu.models import MODELS, get_model

        assert len(MODELS) == 6  # 5 BASELINE configs + the transcode shape
        assert get_model("config1_convert_overlay").overlay
        assert get_model("config6_transcode").encode_jpeg_quality == 85
        with pytest.raises(KeyError):
            get_model("nope")

    def test_config1_engine_runs(self, jax_cpu):
        from rustcv_tpu.models import config1_convert_overlay

        eng = config1_convert_overlay.engine()
        res = eng.tick(
            rects=np.array([[50, 50, 100, 80]], np.int32),
            rect_colors=np.array([[0, 255, 0]], np.uint8),
            block=True,
        )
        assert res.numpy("bgr").shape == (1, 480, 640, 3)
        eng.close()

    def test_config4_harris_runs_small(self, jax_cpu):
        # use the model's spec but at test-friendly size via override driver
        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.core import SimpleConfig
        from rustcv_tpu.runtime import MultiStreamEngine

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 1,
            SimpleConfig(width=160, height=120, pixel_format=PixelFormat.YUYV),
            filter="harris", device_sim=True,
        )
        res = eng.tick(block=True)
        assert res.outputs["filtered"].dtype == bool
        eng.close()


class TestThresholdFlip:
    def test_threshold_all_types(self, rng, jax_cpu):
        from rustcv_tpu.ops import filters

        img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        for t in ("binary", "binary_inv", "trunc", "tozero", "tozero_inv"):
            want = golden.threshold(img, 100, 200, type=t)
            got = np.asarray(filters.threshold_u8(jax_cpu.numpy.asarray(img), 100, 200, type=t))
            np.testing.assert_array_equal(got, want, err_msg=t)
            m = imgproc.threshold(Mat.from_array(img), 100, 200, type=t)
            np.testing.assert_array_equal(m.to_numpy(), want, err_msg=t)

    def test_flip_codes(self, rng, jax_cpu):
        img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
        m = Mat.from_array(img)
        np.testing.assert_array_equal(imgproc.flip(m, 0).to_numpy(), img[::-1])
        np.testing.assert_array_equal(imgproc.flip(m, 1).to_numpy(), img[:, ::-1])
        np.testing.assert_array_equal(imgproc.flip(m, -1).to_numpy(), img[::-1, ::-1])
        dm = Mat.from_device(jax_cpu.device_put(img))
        np.testing.assert_array_equal(imgproc.flip(dm, -1).to_numpy(), img[::-1, ::-1])


class TestMorphologyMedianCanny:
    def test_erode_dilate_parity(self, rng, jax_cpu):
        from rustcv_tpu.ops import filters

        for shape in [(32, 40), (17, 23, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for k in (3, 5):
                np.testing.assert_array_equal(
                    np.asarray(filters.erode_u8(jax_cpu.numpy.asarray(img), k)),
                    golden.erode(img, k),
                )
                np.testing.assert_array_equal(
                    np.asarray(filters.dilate_u8(jax_cpu.numpy.asarray(img), k)),
                    golden.dilate(img, k),
                )

    def test_median3_parity(self, rng, jax_cpu):
        from rustcv_tpu.ops import filters

        img = rng.integers(0, 256, (33, 47), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(filters.median3_u8(jax_cpu.numpy.asarray(img))),
            golden.median3(img),
        )

    def test_canny_parity_and_sanity(self, jax_cpu):
        from rustcv_tpu.capture import synth_bgr
        from rustcv_tpu.ops import filters

        gray = golden.bgr_to_gray(synth_bgr(160, 120, 0))
        want = golden.canny(gray)
        got = np.asarray(filters.canny_u8(jax_cpu.numpy.asarray(gray)))
        np.testing.assert_array_equal(got, want)
        # sanity: the pattern's bar boundaries & square produce edges
        assert want.sum() > 0
        # flat-field → no edges
        flat = np.full((32, 32), 128, np.uint8)
        assert golden.canny(flat).sum() == 0
        assert np.asarray(filters.canny_u8(jax_cpu.numpy.asarray(flat))).sum() == 0

    def test_canny_batched(self, rng, jax_cpu):
        from rustcv_tpu.ops import filters

        imgs = rng.integers(0, 256, (2, 40, 56), dtype=np.uint8)
        want = np.stack([golden.canny(i) for i in imgs])
        got = np.asarray(filters.canny_u8(jax_cpu.numpy.asarray(imgs)))
        np.testing.assert_array_equal(got, want)

"""Edge cases: degenerate shapes, Mat variants, codec corner cases."""

import numpy as np
import pytest

from rustcv_tpu.core import Mat, PixelFormat
from rustcv_tpu.ops import golden


class TestResizeEdges:
    def test_one_pixel_source(self, jax_cpu):
        from rustcv_tpu.ops import resize

        img = np.full((1, 1, 3), 77, np.uint8)
        out = golden.resize_bilinear(img, 5, 4)
        assert (out == 77).all()
        dev = np.asarray(resize.resize_bilinear(jax_cpu.numpy.asarray(img), 5, 4))
        np.testing.assert_array_equal(dev, out)

    def test_extreme_downscale(self, rng, jax_cpu):
        from rustcv_tpu.ops import resize

        img = rng.integers(0, 256, (256, 256, 3), np.uint8)
        want = golden.resize_bilinear(img, 2, 2)
        got = np.asarray(resize.resize_bilinear(jax_cpu.numpy.asarray(img), 2, 2))
        np.testing.assert_array_equal(got, want)

    def test_extreme_upscale(self, rng, jax_cpu):
        from rustcv_tpu.ops import resize

        img = rng.integers(0, 256, (2, 2, 3), np.uint8)
        want = golden.resize_bilinear(img, 64, 64)
        got = np.asarray(resize.resize_bilinear(jax_cpu.numpy.asarray(img), 64, 64))
        np.testing.assert_array_equal(got, want)


class TestMatVariants:
    def test_single_channel(self):
        m = Mat.new(4, 6, 1)
        m.array[:] = 9
        assert m.row_bytes == 6
        assert m.to_numpy().shape == (4, 6, 1)

    def test_four_channel(self):
        m = Mat.new(4, 6, 4)
        assert m.step == 24

    def test_from_device_2d(self, jax_cpu):
        d = jax_cpu.numpy.zeros((5, 7), jax_cpu.numpy.uint8)
        m = Mat.from_device(d)
        assert (m.rows, m.cols, m.channels) == (5, 7, 1)

    def test_invalid_step_rejected(self):
        with pytest.raises(ValueError):
            Mat.new(4, 6, 3, step=10)  # < row_bytes

    def test_copy_independent(self, rng):
        m = Mat.from_array(rng.integers(0, 256, (4, 4, 3), np.uint8))
        c = m.copy()
        c.array[:] = 0
        assert (m.to_numpy() != 0).any()


class TestFourccEdge:
    def test_int_roundtrip(self):
        from rustcv_tpu.core import from_fourcc
        from rustcv_tpu.core.pixel_format import fourcc

        fmt, fcc = from_fourcc(fourcc("YUYV"))
        assert fmt == PixelFormat.YUYV

    def test_nonprintable_fourcc_str(self):
        from rustcv_tpu.core import FourCC

        assert "?" in str(FourCC(0x01020304))


class TestNegotiateEdge:
    def test_empty_modes(self):
        import importlib

        # (the package re-exports the `negotiate` FUNCTION under the same
        # name as the module, so fetch the module explicitly)
        neg = importlib.import_module("rustcv_tpu.capture.negotiate")
        from rustcv_tpu.core import CameraConfig, FormatNotSupported, SimpleConfig

        with pytest.raises(FormatNotSupported):
            neg.negotiate(CameraConfig(), [])
        with pytest.raises(FormatNotSupported):
            neg.negotiate_simple(SimpleConfig(), [])


class TestDrawEdge:
    def test_zero_thickness(self, rng, jax_cpu):
        from rustcv_tpu.ops import draw

        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        want = img.copy()
        golden.rectangle(want.reshape(16, -1), 16, 16, 48, (2, 2, 8, 8), (1, 2, 3), 0)
        got = np.asarray(
            draw.rectangle(
                jax_cpu.numpy.asarray(img),
                jax_cpu.numpy.asarray([2, 2, 8, 8], np.int32),
                jax_cpu.numpy.asarray([1, 2, 3], np.uint8), 0,
            )
        )
        np.testing.assert_array_equal(got, want.reshape(16, 16, 3))

    def test_negative_thickness_noop(self, rng, jax_cpu):
        from rustcv_tpu.ops import draw

        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        got = np.asarray(
            draw.rectangle(
                jax_cpu.numpy.asarray(img),
                jax_cpu.numpy.asarray([2, 2, 8, 8], np.int32),
                jax_cpu.numpy.asarray([1, 2, 3], np.uint8), -3,
            )
        )
        want = img.copy()
        golden.rectangle(want.reshape(16, -1), 16, 16, 48, (2, 2, 8, 8), (1, 2, 3), -3)
        np.testing.assert_array_equal(got, want.reshape(16, 16, 3))


class TestHighguiEdge:
    def test_window_name_sanitized_in_display_dir(self, rng, tmp_path):
        import os

        from rustcv_tpu import highgui

        os.environ["RUSTCV_TPU_DISPLAY_DIR"] = str(tmp_path)
        try:
            m = Mat.from_array(rng.integers(0, 256, (4, 4, 3), np.uint8))
            highgui.imshow("a/b c", m)
            assert (tmp_path / "a_b_c.png").exists()
        finally:
            del os.environ["RUSTCV_TPU_DISPLAY_DIR"]
        highgui.destroy_all_windows()


class TestMultiEngineIsolation:
    def test_two_engines_coexist(self, jax_cpu):
        """Two engines with different configs must not interfere (pipeline
        cache is keyed by spec; per-engine state is isolated)."""
        from rustcv_tpu.capture import SimulationDriver, synth_raw
        from rustcv_tpu.core import SimpleConfig
        from rustcv_tpu.runtime import MultiStreamEngine

        a = MultiStreamEngine(
            SimulationDriver(paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            device_sim=True,
        )
        b = MultiStreamEngine(
            SimulationDriver(paced=False), 3,
            SimpleConfig(width=160, height=120, pixel_format=PixelFormat.NV12),
            filter="sobel_mag", device_sim=True,
        )
        ra1 = a.tick(block=True)
        rb1 = b.tick(block=True)
        ra2 = a.tick(block=True)
        assert ra1.numpy("bgr").shape == (2, 48, 64, 3)
        assert rb1.numpy("bgr").shape == (3, 120, 160, 3)
        assert list(ra2.sequences) == [1, 1]
        assert list(rb1.sequences) == [0, 0, 0]
        want = golden.yuyv_to_bgr(synth_raw(64, 48, PixelFormat.YUYV, 1), 64, 48)
        np.testing.assert_array_equal(ra2.numpy("bgr")[0], want)
        a.close()
        b.close()


class TestColorFuzz:
    def test_yuyv_random_shapes(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        for _ in range(12):
            w = int(rng.integers(1, 100)) * 2
            h = int(rng.integers(1, 80))
            src = rng.integers(0, 256, h * w * 2, dtype=np.uint8)
            want = golden.yuyv_to_bgr(src, w, h)
            got = np.asarray(color.yuyv_to_bgr(jax_cpu.numpy.asarray(src), w, h))
            np.testing.assert_array_equal(got, want, err_msg=f"{w}x{h}")

    def test_nv12_random_shapes(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        for _ in range(8):
            w = int(rng.integers(1, 60)) * 2
            h = int(rng.integers(1, 40)) * 2
            src = rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8)
            want = golden.nv12_to_bgr(src, w, h)
            got = np.asarray(color.nv12_to_bgr(jax_cpu.numpy.asarray(src), w, h))
            np.testing.assert_array_equal(got, want, err_msg=f"{w}x{h}")

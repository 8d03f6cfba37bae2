"""Core type tests: Mat, TickMeter, configs, ClockSynchronizer, telemetry,
pixel formats — mirroring the reference's unit-test anchors
(``rustcv-camera/src/pixel_format.rs:144-172``, ``decode.rs:230-273``)."""

import time

import numpy as np
import pytest

from rustcv_tpu.core import (
    CameraConfig,
    ClockSynchronizer,
    DeviceTelemetry,
    FourCC,
    HealthLevel,
    Mat,
    PixelFormat,
    Priority,
    SimpleConfig,
    TickMeter,
    from_fourcc,
    to_fourcc,
)


class TestMat:
    def test_empty(self):
        m = Mat.empty()
        assert m.is_empty()
        assert m.rows == 0 and m.cols == 0

    def test_new_packed(self):
        m = Mat.new(480, 640, 3)
        assert m.step == 640 * 3
        assert m.row_bytes == 640 * 3
        assert m.array.shape == (480, 640, 3)
        assert not m.is_empty()

    def test_strided(self):
        # step > cols*channels: padded hardware layout (mat.rs:8-13)
        m = Mat.new(4, 5, 3, step=32)
        m.array[:] = 7
        assert m.data.shape == (4, 32)
        assert (m.data[:, :15] == 7).all()
        assert (m.data[:, 15:] == 0).all()

    def test_ensure_size_no_realloc(self):
        m = Mat.new(10, 10, 3)
        buf = m.data
        m.ensure_size(10, 10, 3)
        assert m.data is buf  # zero allocation when dims unchanged
        m.ensure_size(20, 10, 3)
        assert m.rows == 20

    def test_from_array_roundtrip(self):
        a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        m = Mat.from_array(a)
        assert (m.to_numpy() == a).all()

    def test_device_roundtrip(self, jax_cpu):
        a = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        m = Mat.from_array(a)
        dev = m.device()
        assert dev.shape == (4, 4, 3)
        m2 = Mat.from_device(dev)
        assert (m2.to_numpy() == a).all()


class TestTickMeter:
    def test_basic(self):
        tm = TickMeter()
        tm.start()
        time.sleep(0.01)
        tm.stop()
        assert tm.get_counter() == 1
        assert tm.get_time_sec() >= 0.01
        assert tm.get_fps() > 0
        tm.reset()
        assert tm.get_counter() == 0
        assert tm.get_time_sec() == 0.0

    def test_stop_without_start(self):
        tm = TickMeter()
        tm.stop()  # no-op
        assert tm.get_counter() == 0


class TestPixelFormat:
    def test_fourcc_roundtrip(self):
        # rustcv-camera/src/pixel_format.rs:144-172
        for code in ("YUYV", "MJPG", "NV12", "BGR3", "RGB3", "BGRA"):
            fmt, fcc = from_fourcc(code)
            assert fmt != PixelFormat.OTHER
            assert str(to_fourcc(fmt)) == code or fmt is PixelFormat.MJPEG

    def test_unknown_preserved(self):
        fmt, fcc = from_fourcc("XY01")
        assert fmt == PixelFormat.OTHER
        assert str(fcc) == "XY01"
        assert to_fourcc(fmt, fcc) == fcc

    def test_classification(self):
        assert PixelFormat.MJPEG.is_compressed
        assert not PixelFormat.YUYV.is_compressed
        assert PixelFormat.BAYER_RGGB.is_bayer
        assert PixelFormat.YUYV.buffer_size(640, 480) == 640 * 480 * 2
        assert PixelFormat.NV12.buffer_size(640, 480) == 640 * 480 * 3 // 2

    def test_fourcc_str(self):
        assert str(FourCC.from_str("YUYV")) == "YUYV"


class TestConfig:
    def test_builder_chain(self):
        cfg = CameraConfig().resolution(640, 480, Priority.REQUIRED).fps(30).format(
            PixelFormat.YUYV, Priority.HIGH
        )
        assert cfg.resolution_req == [(640, 480, Priority.REQUIRED)]
        assert cfg.fps_req == (30, Priority.MEDIUM)
        assert cfg.buffer_count == 3
        assert cfg.align_stride == 256

    def test_auto_format_policy(self):
        # rustcv-camera/src/config.rs:36-45
        assert SimpleConfig(fps=30).effective_format() == PixelFormat.MJPEG
        assert SimpleConfig(fps=60).effective_format() == PixelFormat.YUYV
        assert SimpleConfig().effective_format() == PixelFormat.MJPEG
        assert (
            SimpleConfig(fps=30, pixel_format=PixelFormat.BGRA32).effective_format()
            == PixelFormat.BGRA32
        )


class TestClockSynchronizer:
    def test_offset_fallback_under_5_samples(self):
        cs = ClockSynchronizer(30)
        t0 = cs.correct(1_000_000_000, 100.0)
        t1 = cs.correct(2_000_000_000, 101.0)
        # offset mode: second sample = first + elapsed hw
        assert t1 - t0 == pytest.approx(1.0, abs=1e-9)

    def test_regression_corrects_jitter(self):
        cs = ClockSynchronizer(30)
        # hw clock at exactly 30fps; arrival has ±2ms jitter
        rng = np.random.default_rng(0)
        hw = [int(i * 33_333_333) for i in range(30)]
        arrivals = [1000.0 + i * 0.033_333_333 + rng.uniform(-0.002, 0.002) for i in range(30)]
        outs = [cs.correct(h, a) for h, a in zip(hw, arrivals)]
        # corrected intervals should be far more regular than raw arrivals
        iv = np.diff(outs[10:])
        assert np.std(iv) < 0.001
        assert abs(cs.drift_ppm) < 50_000

    def test_degenerate_timestamps(self):
        cs = ClockSynchronizer(10)
        for i in range(8):
            cs.correct(42, 100.0 + i * 0.01)  # hw clock frozen
        # must not blow up; slope resets to identity scale
        assert cs.estimated_offset == 0.0


class TestTelemetry:
    def test_thresholds(self):
        # rustcv-core/src/telemetry.rs:59-73
        assert DeviceTelemetry().assess_health().level == HealthLevel.HEALTHY
        assert DeviceTelemetry(temperature_c=86.0).assess_health().level == HealthLevel.CRITICAL
        assert DeviceTelemetry(temperature_c=76.0).assess_health().level == HealthLevel.WARNING
        assert DeviceTelemetry(transmission_errors=101).assess_health().level == HealthLevel.WARNING
        assert DeviceTelemetry(temperature_c=75.0).assess_health().level == HealthLevel.HEALTHY

"""Capture-stack tests: simulation source determinism, ring/borrow contract,
negotiation scoring, Camera and VideoCapture end-to-end (BASELINE config 1)."""

import numpy as np
import pytest

from rustcv_tpu.core import (
    CameraConfig,
    DeviceNotFound,
    Mat,
    PixelFormat,
    Priority,
    ResolutionNotSupported,
    SimpleConfig,
)
from rustcv_tpu.capture import (
    Camera,
    ModeDescriptor,
    SimulationDriver,
    VideoCapture,
    negotiate,
    negotiate_simple,
    score_mode,
    score_mode_msmf,
    synth_bgr,
    synth_raw,
)
from rustcv_tpu.ops import golden


def _driver(**kw):
    kw.setdefault("paced", False)
    return SimulationDriver(**kw)


class TestSynth:
    def test_deterministic(self):
        a = synth_bgr(64, 48, 7)
        b = synth_bgr(64, 48, 7)
        np.testing.assert_array_equal(a, b)
        c = synth_bgr(64, 48, 8)
        assert (a != c).any()  # animated

    def test_yuyv_roundtrip_close(self):
        """encode YUYV (forward BT.601) then decode (reference inverse) must
        be within quantization error of the original."""
        bgr = synth_bgr(64, 48, 0)
        yuyv = synth_raw(64, 48, PixelFormat.YUYV, 0)
        back = golden.yuyv_to_bgr(yuyv, 64, 48)
        err = np.abs(back.astype(int) - bgr.astype(int))
        assert np.percentile(err, 99) <= 12  # 4:2:2 chroma loss bound
        assert err.mean() < 4

    def test_mjpeg_decodable(self):
        raw = synth_raw(64, 48, PixelFormat.MJPEG, 3)
        from rustcv_tpu.ops.decode import decode_mjpeg_host_rgb

        rgb = decode_mjpeg_host_rgb(raw)
        assert rgb.shape == (48, 64, 3)


class TestNegotiation:
    MODES = [
        ModeDescriptor(PixelFormat.YUYV, 640, 480, (30, 60)),
        ModeDescriptor(PixelFormat.YUYV, 1280, 720, (30, 60)),
        ModeDescriptor(PixelFormat.MJPEG, 1920, 1080, (30,)),
        ModeDescriptor(PixelFormat.NV12, 1280, 720, (30, 60, 120)),
    ]

    def test_v4l2_scoring(self):
        cfg = CameraConfig().resolution(1280, 720, Priority.HIGH).format(
            PixelFormat.NV12, Priority.MEDIUM
        )
        # 1280x720 NV12: 100*10 + 50*10 + 12 = 1512 beats YUYV 1280x720 (1012)
        assert score_mode(cfg, 1280, 720, PixelFormat.NV12) == 1512
        assert score_mode(cfg, 1280, 720, PixelFormat.YUYV) == 1012
        best = negotiate(cfg, self.MODES)
        assert (best.width, best.pixel_format) == (1280, PixelFormat.NV12)

    def test_required_resolution_honored(self):
        cfg = CameraConfig().resolution(640, 480, Priority.REQUIRED)
        best = negotiate(cfg, self.MODES)
        assert (best.width, best.height) == (640, 480)

    def test_required_unsatisfiable_raises(self):
        cfg = CameraConfig().resolution(999, 999, Priority.REQUIRED)
        with pytest.raises(ResolutionNotSupported):
            negotiate(cfg, self.MODES)

    def test_msmf_distance_penalty(self):
        cfg = CameraConfig().resolution(1000, 700, Priority.HIGH)
        # no exact match → -distance; 1280x720 distance=300, 640x480=580
        assert score_mode_msmf(cfg, 1280, 720, PixelFormat.YUYV) == -300
        assert score_mode_msmf(cfg, 640, 480, PixelFormat.YUYV) == -580
        cfg2 = CameraConfig().resolution(640, 480, Priority.HIGH)
        assert score_mode_msmf(cfg2, 640, 480, PixelFormat.YUYV) == 1000

    def test_simple_auto_format_policy(self):
        # fps<60 prefers MJPEG (linux/mod.rs:341-376)
        m, fps = negotiate_simple(SimpleConfig(width=1920, height=1080, fps=30), self.MODES)
        assert m.pixel_format == PixelFormat.MJPEG
        # fps>=60: raw preferred when distance doesn't dominate (the
        # reference jointly minimizes distance+penalty, linux/mod.rs:341-376)
        m, fps = negotiate_simple(SimpleConfig(width=1280, height=720, fps=60), self.MODES)
        assert m.pixel_format in (PixelFormat.YUYV, PixelFormat.NV12)
        # …but an exact-resolution MJPEG mode beats a 1000-px-distant raw one
        m, fps = negotiate_simple(SimpleConfig(width=1920, height=1080, fps=60), self.MODES)
        assert m.pixel_format == PixelFormat.MJPEG

    def test_simple_explicit_format(self):
        m, fps = negotiate_simple(
            SimpleConfig(width=700, height=500, pixel_format=PixelFormat.YUYV), self.MODES
        )
        assert m.pixel_format == PixelFormat.YUYV
        assert (m.width, m.height) == (640, 480)


class TestSimulationSource:
    def test_frames_deterministic_and_sequenced(self):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            _driver(),
        )
        f0 = cam.next_frame()
        assert f0.sequence == 0
        expected = synth_raw(64, 48, PixelFormat.YUYV, 0)
        np.testing.assert_array_equal(f0.data, expected)
        f1 = cam.next_frame()
        assert f1.sequence == 1
        cam.close()

    def test_borrow_contract(self):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            _driver(),
        )
        f0 = cam.next_frame()
        _ = f0.data  # fine
        owned = f0.to_owned()
        cam.next_frame()  # requeues slot 0
        with pytest.raises(RuntimeError):
            _ = f0.data  # use-after-requeue must raise
        _ = owned.data  # deep copy survives
        cam.close()

    def test_inject_frame(self):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=4, height=2, pixel_format=PixelFormat.BGR24),
            _driver(),
        )
        payload = np.arange(4 * 2 * 3, dtype=np.uint8)
        cam.source.inject_frame(payload, PixelFormat.BGR24, 4, 2)
        f = cam.next_frame()
        np.testing.assert_array_equal(f.data, payload)
        cam.close()

    def test_unknown_device(self):
        with pytest.raises(DeviceNotFound):
            Camera.open("sim:99", _driver())

    def test_telemetry_and_controls(self):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=640, height=480, fps=30), _driver()
        )
        t = cam.telemetry()
        assert t.link_throughput_mbps > 0
        assert t.assess_health().is_healthy
        cam.controls.sensor.set_exposure(5000)
        cam.controls.lens.set_zoom(2.0)
        state = cam.controls.system.export_state()
        assert state["exposure_us"] == 5000 and state["zoom"] == 2.0
        cam.controls.system.force_reset()
        assert cam.controls.system.export_state()["exposure_us"] is None
        cam.close()

    def test_paced_drops_when_slow(self):
        drv = SimulationDriver(paced=True)
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=352, height=288, fps=120,
                                  pixel_format=PixelFormat.BGR24), drv
        )
        import time

        cam.next_frame()
        time.sleep(0.1)  # sleep ~12 frame times at 120fps
        f = cam.next_frame()
        assert f.sequence > 1  # gaps observed
        assert cam.telemetry().dropped_frames > 0
        cam.close()


class TestCameraDecode:
    def test_read_decoded_matches_oracle(self):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            _driver(),
        )
        mat = Mat()
        cam.read_decoded(mat)
        want = golden.yuyv_to_bgr(synth_raw(64, 48, PixelFormat.YUYV, 0), 64, 48)
        np.testing.assert_array_equal(mat.to_numpy(), want)
        cam.close()

    def test_read_decoded_device_matches_host(self, jax_cpu):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            _driver(),
        )
        dev = cam.read_decoded_device()
        want = golden.yuyv_to_bgr(synth_raw(64, 48, PixelFormat.YUYV, 0), 64, 48)
        np.testing.assert_array_equal(np.asarray(dev), want)
        cam.close()


class TestVideoCapture:
    def test_read_loop(self):
        cap = VideoCapture(0, _driver(), CameraConfig().resolution(640, 480, Priority.REQUIRED).format(PixelFormat.YUYV, Priority.REQUIRED))
        assert cap.is_opened()
        mat = Mat()
        for i in range(3):
            assert cap.read(mat)
            assert (mat.rows, mat.cols) == (480, 640)
        # pixel-exact against the synthetic pattern
        want = golden.yuyv_to_bgr(synth_raw(640, 480, PixelFormat.YUYV, 2), 640, 480)
        np.testing.assert_array_equal(mat.to_numpy(), want)
        cap.release()
        assert not cap.is_opened()

    def test_set_resolution_hot_swap(self):
        cap = VideoCapture(0, _driver(), CameraConfig().resolution(640, 480, Priority.REQUIRED))
        mat = Mat()
        assert cap.read(mat)
        assert (cap.set_resolution(1280, 720)) is True
        assert cap.read(mat)
        assert (mat.cols, mat.rows) == (1280, 720)
        # unsupported resolution → error, stream stays recoverable
        assert cap.set_resolution(123, 45) is False
        assert cap.set_resolution(640, 480) is True
        assert cap.read(mat)
        assert (mat.cols, mat.rows) == (640, 480)
        cap.release()

    def test_device_decode_path(self, jax_cpu):
        cap = VideoCapture(
            0, _driver(),
            CameraConfig().resolution(640, 480, Priority.REQUIRED).format(PixelFormat.YUYV, Priority.REQUIRED),
            decode_on_device=True,
        )
        mat = Mat()
        assert cap.read(mat)
        assert mat.is_on_device
        want = golden.yuyv_to_bgr(synth_raw(640, 480, PixelFormat.YUYV, 0), 640, 480)
        np.testing.assert_array_equal(mat.to_numpy(), want)
        cap.release()

    def test_mjpeg_videocapture_read(self):
        cap = VideoCapture(
            0, _driver(),
            CameraConfig().resolution(64, 48, Priority.REQUIRED).format(
                PixelFormat.MJPEG, Priority.REQUIRED
            ),
        )
        mat = Mat()
        assert cap.read(mat)
        from rustcv_tpu.ops.decode import decode_mjpeg_host_rgb

        want = decode_mjpeg_host_rgb(synth_raw(64, 48, PixelFormat.MJPEG, 0))[..., ::-1]
        np.testing.assert_array_equal(mat.to_numpy(), want)
        assert (cap.get_width(), cap.get_height()) == (64, 48)
        cap.release()

    def test_baseline_config1_end_to_end(self, jax_cpu):
        """BASELINE config 1: 640×480 YUYV→BGR + rectangle overlay, pixel-exact."""
        import jax.numpy as jnp

        from rustcv_tpu.ops import draw

        cap = VideoCapture(
            0, _driver(),
            CameraConfig().resolution(640, 480, Priority.REQUIRED).format(PixelFormat.YUYV, Priority.REQUIRED),
            decode_on_device=True,
        )
        mat = Mat()
        assert cap.read(mat)
        out = draw.rectangle(
            mat.device(), jnp.asarray([100, 100, 200, 150], jnp.int32),
            jnp.asarray([0, 255, 0], jnp.uint8), 3,
        )
        # oracle: host decode + host rectangle
        want = golden.yuyv_to_bgr(synth_raw(640, 480, PixelFormat.YUYV, 0), 640, 480)
        golden.rectangle(want.reshape(480, -1), 480, 640, 640 * 3, (100, 100, 200, 150), (0, 255, 0), 3)
        np.testing.assert_array_equal(np.asarray(out), want.reshape(480, 640, 3))
        cap.release()


class TestBandwidth:
    def test_bandwidth_exceeded(self):
        from rustcv_tpu.core import BandwidthExceeded

        # 1080p60 YUYV ≈ 2 GBps*8... well above a 100 Mbps budget
        drv = SimulationDriver(paced=False, bandwidth_limit_mbps=100)
        with pytest.raises(BandwidthExceeded) as ei:
            Camera.open_with(
                "sim:0",
                SimpleConfig(width=1920, height=1080, fps=60,
                             pixel_format=PixelFormat.YUYV),
                drv,
            )
        assert ei.value.required_mbps > ei.value.limit_mbps
        assert "MJPEG" in ei.value.suggestion
        # a modest mode fits the same budget
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, fps=30,
                                  pixel_format=PixelFormat.YUYV), drv
        )
        cam.close()


def test_worker_survives_malformed_config(jax_cpu):
    """A non-CameraError during open (e.g. wrong config type) must degrade —
    worker alive, read() returns False promptly — never a dead worker that
    hangs the caller on the response queue (found by a bad-config probe)."""
    from rustcv_tpu.core import SimpleConfig
    from rustcv_tpu.core.mat import Mat
    from rustcv_tpu.capture.videocapture import VideoCapture

    cap = VideoCapture("sim:0", config=SimpleConfig(width=64, height=48))  # wrong type
    m = Mat.empty()
    assert cap.read(m) is False
    assert not cap.is_opened()
    assert cap._worker.is_alive()  # degraded, not dead
    assert cap._last_error is not None
    cap.release()

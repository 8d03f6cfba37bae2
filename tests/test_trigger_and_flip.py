"""Software trigger gating + bottom-up (negative-pitch) frame decode."""

import threading
import time

import numpy as np
import pytest

from rustcv_tpu.capture import Camera, SimulationDriver, synth_raw
from rustcv_tpu.capture.source import TriggerConfig, TriggerMode
from rustcv_tpu.core import CameraError, Frame, Mat, PixelFormat, SimpleConfig, Timestamp
from rustcv_tpu.ops import golden
from rustcv_tpu.ops.decode import decode_frame_host, decode_to_device


class TestSoftwareTrigger:
    def test_gated_capture(self):
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            SimulationDriver(paced=False),
        )
        cam.controls.system.set_trigger(TriggerConfig(mode=TriggerMode.SOFTWARE))
        got = {}

        def consumer():
            got["frame"] = cam.next_frame()

        t = threading.Thread(target=consumer, daemon=True)
        t.start()
        time.sleep(0.1)
        assert "frame" not in got  # blocked, no trigger yet
        cam.controls.system.fire_trigger()
        t.join(timeout=2)
        assert got["frame"].metadata.trigger_fired
        # back to free-run after reset
        cam.controls.system.force_reset()
        f = cam.next_frame()
        assert not f.metadata.trigger_fired
        cam.close()


class TestBottomUp:
    def _frame(self, fmt, data, w=64, h=48, bottom_up=True):
        return Frame(data, w, h, fmt, 0, Timestamp(0, 0.0), bottom_up=bottom_up)

    def test_yuyv_bottom_up_host(self):
        raw = synth_raw(64, 48, PixelFormat.YUYV, 4)
        mat = Mat()
        decode_frame_host(self._frame(PixelFormat.YUYV, raw), mat)
        want = golden.yuyv_to_bgr(raw, 64, 48)[::-1]
        np.testing.assert_array_equal(mat.to_numpy(), want)

    def test_yuyv_bottom_up_device(self, jax_cpu):
        raw = synth_raw(64, 48, PixelFormat.YUYV, 4)
        dev = decode_to_device(self._frame(PixelFormat.YUYV, raw))
        want = golden.yuyv_to_bgr(raw, 64, 48)[::-1]
        np.testing.assert_array_equal(np.asarray(dev), want)

    def test_planar_rejected(self):
        raw = synth_raw(64, 48, PixelFormat.NV12, 0)
        mat = Mat()
        from rustcv_tpu.core import DecodeError

        with pytest.raises(DecodeError):
            decode_frame_host(self._frame(PixelFormat.NV12, raw), mat)

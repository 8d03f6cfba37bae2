"""Real V4L2 capture backend — the direct-ioctl zero-copy driver.

Ports the reference's flagship Stack-B backend
(``rustcv-camera/src/backend/linux/mod.rs:38-446``, ``sys.rs:18-443``) behind
this package's :class:`FrameSource`/:class:`Driver` protocol, proving the
protocol's extension point on real hardware:

- device discovery walks ``/dev/video*`` (Stack-A ``device.rs:15-41``);
- mode enumeration + the SAME Python negotiation scoring used by the
  simulation driver (``capture/negotiate.py``) pick fmt×size×fps;
- the native layer (``native/v4l2.cpp``) applies S_FMT/S_PARM, disables
  ``exposure_auto_priority`` (the low-light throttle fix), mmaps the kernel
  ring, and serves ONE blocking DQBUF per frame;
- ``next_frame`` returns a zero-copy view of the mmap buffer; the previous
  buffer is re-queued on the next call, and the previous Frame is
  invalidated (use-after-requeue raises — the borrow-checker contract).

Hardware-gated: everything degrades to ``DeviceNotFound`` on camera-less
hosts (tests skip, mirroring the reference's bench behavior,
``benches/capture.rs:31-37``).
"""

from __future__ import annotations

import ctypes
import glob
from typing import List, Optional, Tuple

import numpy as np

from ..core.config import CameraConfig, ResolvedConfig, SimpleConfig
from ..core.errors import (
    CameraError, DeviceNotFound, FormatNotSupported, StreamNotStarted,
)
from ..core.frame import Frame, FrameMetadata, Timestamp
from ..core.pixel_format import FourCC, PixelFormat, from_fourcc, to_fourcc
from ..core.telemetry import DeviceTelemetry
from ..core.time_sync import ClockSynchronizer
from .negotiate import negotiate, resolve
from .source import DeviceControls, DeviceInfo, Driver, FrameSource, ModeDescriptor


def _lib():
    from .. import native

    lib = native.get_lib()
    if lib is None or not lib.rcv_v4l2_available():
        raise CameraError(
            f"V4L2 backend unavailable: {native.build_error() or 'non-Linux build'}"
        )
    return lib


def list_video_devices() -> List[str]:
    return sorted(glob.glob("/dev/video*"))


def enumerate_modes(path: str) -> List[ModeDescriptor]:
    """Open + QUERYCAP + enumerate discrete fmt×size modes, then close."""
    lib = _lib()
    err = ctypes.c_int()
    h = lib.rcv_v4l2_open(path.encode(), ctypes.byref(err))
    if not h:
        raise DeviceNotFound(f"{path} (rc={err.value})")
    try:
        cap = 256
        fourccs = (ctypes.c_uint32 * cap)()
        ws = (ctypes.c_int * cap)()
        hs = (ctypes.c_int * cap)()
        fps = (ctypes.c_int * cap)()
        n = lib.rcv_v4l2_enum_modes(h, fourccs, ws, hs, fps, cap)
        modes = []
        for i in range(n):
            fmt = from_fourcc(FourCC(fourccs[i]))
            modes.append(
                ModeDescriptor(
                    pixel_format=fmt, width=ws[i], height=hs[i],
                    fps_options=(fps[i],) if fps[i] > 0 else (30,),
                )
            )
        return modes
    finally:
        lib.rcv_v4l2_close(h)


class V4L2Source(FrameSource):
    """One open, streaming V4L2 device (zero-copy DQBUF semantics)."""

    def __init__(self, path: str, resolved: ResolvedConfig):
        lib = _lib()
        err = ctypes.c_int()
        self._h = lib.rcv_v4l2_open(path.encode(), ctypes.byref(err))
        if not self._h:
            raise DeviceNotFound(f"{path} (rc={err.value})")
        self._lib = lib
        self._path = path
        got_fcc = ctypes.c_uint32()
        gw = ctypes.c_int()
        gh = ctypes.c_int()
        gs = ctypes.c_int()
        gsize = ctypes.c_long()
        rc = lib.rcv_v4l2_setup(
            self._h, to_fourcc(resolved.pixel_format).value,
            resolved.width, resolved.height, resolved.fps,
            resolved.buffer_count,
            ctypes.byref(got_fcc), ctypes.byref(gw), ctypes.byref(gh),
            ctypes.byref(gs), ctypes.byref(gsize),
        )
        if rc != 0:
            lib.rcv_v4l2_close(self._h)
            self._h = None
            raise CameraError(f"V4L2 setup failed on {path} (rc={rc})")
        fmt = from_fourcc(FourCC(got_fcc.value))
        if fmt == PixelFormat.OTHER:
            raise FormatNotSupported(f"driver applied unknown fourcc {got_fcc.value:#x}")
        # The driver may adjust geometry: the RESOLVED config is what it did.
        self._cfg = ResolvedConfig(
            width=gw.value, height=gh.value, fps=resolved.fps,
            pixel_format=fmt, buffer_count=resolved.buffer_count,
        )
        self._stride = gs.value
        self._started = True  # STREAMON happened in setup
        self._clock = ClockSynchronizer(30)
        self._prev_frame: Optional[Frame] = None
        self._first_seq: Optional[int] = None
        self._last_seq: Optional[int] = None
        self._frames = 0

    def start(self) -> None:
        if self._h is None:
            raise CameraError("source closed")
        self._started = True

    def stop(self) -> None:
        if self._h is not None and self._started:
            self._lib.rcv_v4l2_stop(self._h)
            self._started = False
        if self._prev_frame is not None:
            self._prev_frame.invalidate()
            self._prev_frame = None

    def resolved_config(self) -> ResolvedConfig:
        return self._cfg

    def next_frame(self) -> Frame:
        if self._h is None or not self._started:
            raise StreamNotStarted("call start() before next_frame()")
        if self._prev_frame is not None:
            self._prev_frame.invalidate()  # its mmap buffer is re-queued now
        data = ctypes.POINTER(ctypes.c_uint8)()
        used = ctypes.c_long()
        seq = ctypes.c_long()
        ts = ctypes.c_long()
        slot = self._lib.rcv_v4l2_dequeue(
            self._h, ctypes.byref(data), ctypes.byref(used),
            ctypes.byref(seq), ctypes.byref(ts),
        )
        if slot < 0:
            raise CameraError(f"DQBUF failed on {self._path} (rc={slot})")
        view = np.ctypeslib.as_array(data, shape=(used.value,))
        if self._first_seq is None:
            self._first_seq = int(seq.value)
        self._last_seq = int(seq.value)
        self._frames += 1
        frame = Frame(
            view, self._cfg.width, self._cfg.height, self._cfg.pixel_format,
            int(seq.value),
            Timestamp(int(ts.value), self._clock.correct(int(ts.value))),
            stride=self._stride if self._stride else None,
            metadata=FrameMetadata(),
        )
        self._prev_frame = frame
        return frame

    def telemetry(self) -> DeviceTelemetry:
        t = DeviceTelemetry()
        if self._first_seq is not None and self._last_seq is not None:
            expected = self._last_seq - self._first_seq + 1
            t.dropped_frames = max(0, expected - self._frames)
        return t

    def close(self) -> None:
        if self._h is not None:
            self.stop()
            self._lib.rcv_v4l2_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class V4L2Driver(Driver):
    """Driver over ``/dev/video*`` (Stack-A ``V4l2Driver`` semantics)."""

    device_prefix = "/dev/video"  # int index → "/dev/video{i}" (mod.rs:305)

    def list_devices(self) -> List[DeviceInfo]:
        out = []
        for path in list_video_devices():
            try:
                enumerate_modes(path)
            except CameraError:
                continue  # metadata/output nodes etc.
            out.append(DeviceInfo(id=path, name=path, driver="v4l2"))
        return out

    def open(
        self, device_id: str, config: CameraConfig
    ) -> Tuple[FrameSource, DeviceControls]:
        modes = enumerate_modes(device_id)
        modes = [m for m in modes if m.pixel_format != PixelFormat.OTHER]
        if not modes:
            raise FormatNotSupported(f"{device_id} exposes no supported formats")
        best = negotiate(config, modes)
        resolved = ResolvedConfig(
            width=best.width, height=best.height,
            fps=best.fps_options[0], pixel_format=best.pixel_format,
            buffer_count=config.buffer_count,
        )
        return V4L2Source(device_id, resolved), DeviceControls()

    def open_simple(
        self, device_id: str, config: SimpleConfig
    ) -> Tuple[FrameSource, DeviceControls]:
        modes = [
            m for m in enumerate_modes(device_id)
            if m.pixel_format != PixelFormat.OTHER
        ]
        if not modes:
            raise FormatNotSupported(f"{device_id} exposes no supported formats")
        resolved = resolve(config, modes)
        return V4L2Source(device_id, resolved), DeviceControls()

"""videoio — facade module mirroring ``rustcv::videoio``.

The reference exposes capture through ``rustcv::videoio::VideoCapture`` with
a compile-time backend factory (``videoio/backend.rs``); here the factory is
:func:`create_driver` and backends are runtime-pluggable Driver objects.
"""

from __future__ import annotations

from .capture import (
    Camera,
    FileDriver,
    SimulationDriver,
    VideoCapture,
    VideoWriter,
    default_driver,
    resolve_device_id,
)
from .capture.source import Driver


def create_driver(backend: str = "simulation", **kwargs) -> Driver:
    """Backend factory (the ``create_driver``/``BackendType`` analog,
    ``rustcv/src/videoio/backend.rs:6-48``): "simulation" (Python),
    "native" (C++ ring), and "v4l2" (real direct-ioctl camera capture on
    Linux hosts with ``/dev/video*`` — capture/v4l2.py)."""
    if backend == "simulation":
        return SimulationDriver(**kwargs)
    if backend == "native":
        from .capture.native_source import NativeSimulationSource  # noqa: F401

        # The native ring is exposed per-source; enumeration still comes
        # from the simulation driver (same virtual devices).
        return SimulationDriver(**kwargs)
    if backend == "v4l2":
        from .capture.v4l2 import V4L2Driver

        return V4L2Driver(**kwargs)
    if backend == "file":
        return FileDriver(**kwargs)
    raise ValueError(
        f"unknown backend {backend!r} (available: simulation, native, v4l2, file)"
    )


def default_backend() -> str:
    """Prefer a real camera when one exists (the reference's compile-time
    OS switch, resolved at runtime here); otherwise simulation."""
    try:
        from .capture.v4l2 import V4L2Driver, list_video_devices

        if list_video_devices() and V4L2Driver().list_devices():
            return "v4l2"
    except Exception:  # noqa: BLE001 — any probe failure → simulation
        pass
    return "simulation"


__all__ = [
    "Camera", "Driver", "FileDriver", "SimulationDriver", "VideoCapture",
    "VideoWriter", "create_driver", "default_backend", "default_driver",
    "resolve_device_id",
]

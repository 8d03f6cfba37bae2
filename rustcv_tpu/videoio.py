"""videoio — facade module mirroring ``rustcv::videoio``.

The reference exposes capture through ``rustcv::videoio::VideoCapture`` with
a compile-time backend factory (``videoio/backend.rs``); here the factory is
:func:`create_driver` and backends are runtime-pluggable Driver objects.
"""

from __future__ import annotations

from .capture import (
    Camera,
    SimulationDriver,
    VideoCapture,
    default_driver,
    resolve_device_id,
)
from .capture.source import Driver


def create_driver(backend: str = "simulation", **kwargs) -> Driver:
    """Backend factory (the ``create_driver``/``BackendType`` analog,
    ``rustcv/src/videoio/backend.rs:6-48``). TPU hosts have no camera
    drivers; "simulation" (Python) and "native" (C++ ring) are built in."""
    if backend == "simulation":
        return SimulationDriver(**kwargs)
    if backend == "native":
        from .capture.native_source import NativeSimulationSource  # noqa: F401

        # The native ring is exposed per-source; enumeration still comes
        # from the simulation driver (same virtual devices).
        return SimulationDriver(**kwargs)
    raise ValueError(f"unknown backend {backend!r} (available: simulation, native)")


def default_backend() -> str:
    return "simulation"


__all__ = [
    "Camera", "Driver", "SimulationDriver", "VideoCapture", "create_driver",
    "default_backend", "default_driver", "resolve_device_id",
]

"""Capture layer: FrameSource protocol, simulation driver, Camera and
VideoCapture facades, and negotiation."""

from .avi import AviMjpegReader, FileDriver, FileSource, VideoWriter
from .camera import Camera, default_driver
from .negotiate import negotiate, negotiate_simple, resolve, score_mode, score_mode_msmf
from .simulation import (
    SimulationDriver,
    SimulationSource,
    default_modes,
    encode_bgra,
    encode_mjpeg,
    encode_nv12,
    encode_rgb,
    encode_yuyv,
    synth_bgr,
    synth_raw,
)
from .source import (
    DeviceControls,
    DeviceInfo,
    Driver,
    FrameSource,
    LensControl,
    ModeDescriptor,
    SensorControl,
    SystemControl,
    TriggerConfig,
    TriggerMode,
    TriggerPolarity,
)
from .videocapture import VideoCapture, resolve_device_id

__all__ = [
    "AviMjpegReader", "Camera", "DeviceControls", "DeviceInfo", "Driver",
    "FileDriver", "FileSource", "FrameSource", "VideoWriter",
    "LensControl", "ModeDescriptor", "SensorControl", "SimulationDriver",
    "SimulationSource", "SystemControl", "TriggerConfig", "TriggerMode",
    "TriggerPolarity", "VideoCapture", "default_driver", "default_modes",
    "encode_bgra", "encode_mjpeg", "encode_nv12", "encode_rgb", "encode_yuyv",
    "negotiate", "negotiate_simple", "resolve", "resolve_device_id",
    "score_mode", "score_mode_msmf", "synth_bgr", "synth_raw",
]

"""Zero-copy capture demo — port of
``rustcv-camera/examples/zero_copy_demo.rs:36-93``: dequeue N frames through
the borrow-checked ring view, track sequence gaps (drops) and intervals.
Uses the native C++ ring when available, else the Python simulation source.
"""

import argparse

from rustcv_tpu.capture import Camera, SimulationDriver
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.utils import CaptureStats


def main(n_frames: int = 100, native: bool = True) -> None:
    cfg = SimpleConfig(width=640, height=480, fps=120, pixel_format=PixelFormat.YUYV)
    src = None
    if native:
        try:
            from rustcv_tpu.capture.native_source import NativeSimulationSource
            from rustcv_tpu.capture.negotiate import resolve
            from rustcv_tpu.capture.simulation import default_modes

            src = NativeSimulationSource(resolve(cfg, default_modes()), paced=True)
            src.start()
            print("using native C++ ring")
        except Exception as e:  # noqa: BLE001
            print(f"native unavailable ({e}); falling back to Python source")
    if src is None:
        cam = Camera.open_with("sim:0", cfg, SimulationDriver(paced=True))
        src = cam.source

    stats = CaptureStats()
    for _ in range(n_frames):
        frame = src.next_frame()
        stats.record(frame.sequence)
        _ = frame.data[0]  # touch the zero-copy view

    print(stats.report())
    src.stop()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--no-native", action="store_true")
    a = p.parse_args()
    main(a.frames, not a.no_native)

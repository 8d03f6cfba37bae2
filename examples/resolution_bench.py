"""Resolution sweep bench — port of
``rustcv-camera/examples/resolution_bench.rs:25-139``: run each preset
resolution for a fixed duration through the full decode pipeline and print a
summary table (FPS / p99 interval / drops).
"""

import argparse
import time

from rustcv_tpu.capture import Camera, SimulationDriver
from rustcv_tpu.core import Mat, PixelFormat, SimpleConfig
from rustcv_tpu.utils import CaptureStats

RESOLUTIONS = [(640, 480), (1280, 720), (1920, 1080)]


def main(seconds: float = 2.0, fps: int = 60) -> None:
    rows = []
    for w, h in RESOLUTIONS:
        cam = Camera.open_with(
            "sim:0",
            SimpleConfig(width=w, height=h, fps=fps, pixel_format=PixelFormat.YUYV),
            SimulationDriver(paced=True),
        )
        mat = Mat()
        stats = CaptureStats()
        t_end = time.perf_counter() + seconds
        while time.perf_counter() < t_end:
            frame = cam.next_frame()
            stats.record(frame.sequence)
            from rustcv_tpu.ops.decode import decode_frame_host

            decode_frame_host(frame, mat)
        cam.close()
        r = stats.report()
        rows.append((f"{w}x{h}", r))

    print(f"{'resolution':>12} {'fps':>8} {'p99 ms':>8} {'max ms':>8} {'drops':>6}")
    for name, r in rows:
        print(
            f"{name:>12} {r['fps']:>8.1f} {r['p99_interval_ms']:>8.2f} "
            f"{r['max_interval_ms']:>8.2f} {r['dropped']:>6}"
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--fps", type=int, default=60)
    a = p.parse_args()
    main(a.seconds, a.fps)

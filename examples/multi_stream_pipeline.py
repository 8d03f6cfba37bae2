"""The headline 8-stream pipeline (BASELINE config 5 shape): batched
capture-sim → decode → filter → overlay with sustained-throughput stats.
This is what bench.py measures; run it directly to see per-stage numbers.
"""

import argparse

import numpy as np

from rustcv_tpu.capture import SimulationDriver
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.runtime import MultiStreamEngine


def main(n_streams: int = 8, width: int = 1920, height: int = 1080, ticks: int = 60) -> None:
    eng = MultiStreamEngine(
        SimulationDriver(device_count=n_streams, paced=False), n_streams,
        SimpleConfig(width=width, height=height, fps=60, pixel_format=PixelFormat.YUYV),
        filter="blur_sobel", overlay=True, device_sim=True,
    )
    rects = np.tile(np.array([[100, 100, 400, 300]], np.int32), (n_streams, 1))
    colors = np.tile(np.array([[0, 255, 0]], np.uint8), (n_streams, 1))

    tp = eng.run(ticks, warmup=5, measure_latency=False, rects=rects, rect_colors=colors)
    lat = eng.run(max(10, ticks // 4), warmup=2, measure_latency=True, rects=rects, rect_colors=colors)
    print(
        f"{n_streams}x{width}x{height}: {tp.fps_total:.0f} fps aggregate "
        f"({tp.fps_per_stream:.1f}/stream), sync p50 {lat.p50_latency_ms:.2f} ms, "
        f"p99 {lat.p99_latency_ms:.2f} ms, drops {tp.dropped_frames}"
    )
    eng.close()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=8)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--ticks", type=int, default=60)
    a = p.parse_args()
    main(a.streams, a.width, a.height, a.ticks)

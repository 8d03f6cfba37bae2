"""set_resolution hot-swap latency on the real chip (VERDICT r3 #8).

Reference semantics: VideoCapture.set_resolution stops the stream,
renegotiates, restarts (rustcv/src/videoio/mod.rs:115-147). Our static-shape
answer: warm_buckets precompiles every shape bucket so the swap is a
pipeline-cache hit. This probe measures, on the real chip:

  * cold swap: first-ever set_resolution to a bucket (includes the remote
    compile of that bucket's program)
  * warm swap: set_resolution after warm_buckets (cache hit) — p50 over
    the full bucket cycle, including one post-swap tick (proof the new
    program is live, not just selected)

Prints one JSON line; paste into docs/PERFORMANCE.md.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from rustcv_tpu.capture import SimulationDriver
    from rustcv_tpu.core import PixelFormat, SimpleConfig
    from rustcv_tpu.runtime import MultiStreamEngine
    from rustcv_tpu.runtime.buckets import SHAPE_BUCKETS

    n = 4
    eng = MultiStreamEngine(
        SimulationDriver(device_count=n, paced=False), n,
        SimpleConfig(width=1920, height=1080, fps=60,
                     pixel_format=PixelFormat.YUYV),
        filter="blur_sobel", overlay=True, device_sim=True,
    )
    rects = np.tile(np.array([[10, 10, 100, 80]], np.int32), (n, 1))
    colors = np.tile(np.array([[0, 255, 0]], np.uint8), (n, 1))

    def tick_once():
        eng.run(2, warmup=0, measure_latency=False,
                rects=rects, rect_colors=colors)

    tick_once()  # compile + run the 1080p program

    # COLD: swap to a bucket never compiled in this process.
    cold_w, cold_h = 1280, 720
    t0 = time.perf_counter()
    eng.set_resolution(cold_w, cold_h)
    tick_once()
    cold_s = time.perf_counter() - t0

    # WARM: precompile every bucket, then cycle through swaps.
    t0 = time.perf_counter()
    n_warmed = eng.warm_buckets()
    warm_compile_s = time.perf_counter() - t0
    lat = []
    for w, h in list(SHAPE_BUCKETS) + list(SHAPE_BUCKETS):
        if w % 2:
            continue
        t0 = time.perf_counter()
        eng.set_resolution(w, h)
        tick_once()
        lat.append(time.perf_counter() - t0)
    eng.close()
    lat_ms = sorted(v * 1e3 for v in lat)
    print(json.dumps({
        "buckets": len(SHAPE_BUCKETS),
        "n_warmed": n_warmed,
        "cold_swap_s": round(cold_s, 2),
        "warm_compile_s": round(warm_compile_s, 2),
        "warm_swap_p50_ms": round(lat_ms[len(lat_ms) // 2], 1),
        "warm_swap_min_ms": round(lat_ms[0], 1),
        "warm_swap_max_ms": round(lat_ms[-1], 1),
        "n_swaps": len(lat_ms),
    }))


if __name__ == "__main__":
    main()

"""Config-3 (32x4K blur_sobel) monolithic vs sub_batch=8 A/B on-chip.

The 1080p sub-batch win (probe_subbatch.py: +37/+43% at 16/32 streams)
should transfer to the BASELINE 4K config, whose 32-stream monolithic
tick is the widest program in the zoo. One unchained eng.run per form,
same shape as bench_models.py's config-3 row.
"""
import json

import numpy as np

from rustcv_tpu.capture import SimulationDriver
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.runtime import MultiStreamEngine


def run(sub):
    n, w, h = 32, 3840, 2160
    eng = MultiStreamEngine(
        SimulationDriver(device_count=n, paced=False), n,
        SimpleConfig(width=w, height=h, fps=30,
                     pixel_format=PixelFormat.YUYV),
        filter="blur_sobel", device_sim=True, sub_batch=sub,
    )
    best = None
    for _ in range(3):
        st = eng.run(30, warmup=3, measure_latency=False)
        if best is None or st.fps_total > best.fps_total:
            best = st
    eng.close()
    rec = {"sub": sub, "fps_total": round(best.fps_total, 1),
           "ms_per_tick": round(best.wall_s / max(1, best.ticks) * 1e3, 3)}
    print("RESULT " + json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    a = run(None)
    b = run(8)
    print(f"sub_batch=8 vs monolithic: "
          f"{b['fps_total'] / a['fps_total'] - 1:+.1%}")

"""A/B the fused Pallas decode kernel vs the XLA path in the COMPOSED
headline tick (8×1080p device-sim, blur_sobel + overlay), plus exactness
of the fused outputs against the XLA program on-chip.

Usage: python probe_decode_ab.py [xla pallas ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = ("xla", "xla_fused", "pallas", "pallas_tick")

_CHILD = r"""
import json, os
import numpy as np
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.capture import SimulationDriver
from rustcv_tpu.runtime import MultiStreamEngine

n = 8
eng = MultiStreamEngine(
    SimulationDriver(device_count=n, paced=False), n,
    SimpleConfig(width=1920, height=1080, fps=60,
                 pixel_format=PixelFormat.YUYV),
    filter="blur_sobel", overlay=True, device_sim=True,
)
rects = np.tile(np.array([[100, 100, 400, 300]], np.int32), (n, 1))
colors = np.tile(np.array([[0, 255, 0]], np.uint8), (n, 1))
res = []
for _ in range(3):
    tp = eng.run(200, warmup=5, measure_latency=False,
                 rects=rects, rect_colors=colors)
    res.append(1e3 / tp.fps_per_stream)
eng.close()
print("RESULT " + json.dumps({
    "impl": os.environ.get("RUSTCV_DECODE", "xla"),
    "ms_per_tick_runs": [round(v, 3) for v in res],
    "ms_per_tick_best": round(min(res), 3),
}))
"""


def main() -> None:
    todo = sys.argv[1:] or VARIANTS
    results = []
    for impl in todo:
        env = dict(os.environ, RUSTCV_DECODE=impl)
        p = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=2400,
        )
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("RESULT ")), None)
        if line is None:
            print(f"{impl}: FAILED\n{p.stdout[-1500:]}\n{p.stderr[-2500:]}")
            continue
        rec = json.loads(line[len("RESULT "):])
        results.append(rec)
        print(json.dumps(rec))
    if len(results) == len(VARIANTS):
        best = min(results, key=lambda r: r["ms_per_tick_best"])
        print(f"\nbest: {best['impl']} @ {best['ms_per_tick_best']} ms/tick")


if __name__ == "__main__":
    main()

"""A/B the packed-BGR byte-interleave lowering inside the COMPOSED headline
tick (VERDICT r3 #2: the stack→bitcast→reshape relayout costs ~430 MB/tick).

Each variant runs in a subprocess (RUSTCV_INTERLEAVE is read at trace time)
and measures the full 8×1080p device-sim tick with dispatch-N/fetch-last —
the only timing that counts is the composed program's (PERFORMANCE lesson 7).

Usage:  python probe_interleave.py            # all variants
        python probe_interleave.py stack pad  # subset
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = ("stack", "pad", "set", "transpose")

_CHILD = r"""
import json, os, time
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
    "impl": os.environ.get("RUSTCV_INTERLEAVE", "stack"),
    "ms_per_tick_runs": [round(v, 3) for v in res],
    "ms_per_tick_best": round(min(res), 3),
}))
"""


def main() -> None:
    todo = sys.argv[1:] or VARIANTS
    results = []
    for impl in todo:
        env = dict(os.environ, RUSTCV_INTERLEAVE=impl)
        p = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, cwd=os.path.dirname(
                os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=1800,
        )
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("RESULT ")), None)
        if line is None:
            print(f"{impl}: FAILED\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        rec = json.loads(line[len("RESULT "):])
        results.append(rec)
        print(json.dumps(rec))
    if results:
        best = min(results, key=lambda r: r["ms_per_tick_best"])
        print(f"\nbest: {best['impl']} @ {best['ms_per_tick_best']} ms/tick")


if __name__ == "__main__":
    main()

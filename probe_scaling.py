"""Stream-scaling curve on the real chip (VERDICT r3 #7).

1/2/4/8/16/32 × 1080p (+ 8×4K) through the headline pipeline
(device-sim YUYV → decode → blur_sobel stencil → overlay): fps, ms/tick,
HBM working set, to the saturation point. Each config runs in its own
subprocess (programs are per-batch-shape; isolation keeps HBM clean).

Output: one JSON line per config + a summary table; paste into
docs/BENCH_SNAPSHOT.md and examples/launch_distributed.py's sizing table.

Usage: python probe_scaling.py [n_streams ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CONFIGS = [
    (1, 1920, 1080), (2, 1920, 1080), (4, 1920, 1080), (8, 1920, 1080),
    (16, 1920, 1080), (32, 1920, 1080), (8, 3840, 2160),
]

_CHILD = r"""
import json, os
import numpy as np
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.capture import SimulationDriver
from rustcv_tpu.runtime import MultiStreamEngine

n, w, h = {n}, {w}, {h}
eng = MultiStreamEngine(
    SimulationDriver(device_count=n, paced=False), n,
    SimpleConfig(width=w, height=h, fps=60, pixel_format=PixelFormat.YUYV),
    filter="blur_sobel", overlay=True, device_sim=True,
)
rects = np.tile(np.array([[100, 100, 400, 300]], np.int32), (n, 1))
colors = np.tile(np.array([[0, 255, 0]], np.uint8), (n, 1))
best = None
for _ in range(3):
    tp = eng.run(120, warmup=5, measure_latency=False,
                 rects=rects, rect_colors=colors)
    if best is None or tp.fps_total > best.fps_total:
        best = tp
eng.close()
# HBM working set: wire bytes + packed BGR + gray + filtered per tick
wire = n * w * h * 2
outs = n * (w * h * 3 + 2 * w * h)
print("RESULT " + json.dumps({{
    "n_streams": n, "resolution": f"{{w}}x{{h}}",
    "fps_total": round(best.fps_total, 1),
    "fps_per_stream": round(best.fps_per_stream, 2),
    "ms_per_tick": round(1e3 / best.fps_per_stream, 3),
    "hbm_mb_per_tick": round((wire + outs) / 1e6, 1),
}}))
"""


def main() -> None:
    if sys.argv[1:]:
        todo = [(int(a), 1920, 1080) for a in sys.argv[1:]]
    else:
        todo = CONFIGS
    rows = []
    for n, w, h in todo:
        p = subprocess.run(
            [sys.executable, "-c", _CHILD.format(n=n, w=w, h=h)],
            capture_output=True, text=True, timeout=2400,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=dict(os.environ),
        )
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("RESULT ")), None)
        if line is None:
            print(f"{n}x{w}x{h}: FAILED\n{(p.stderr or p.stdout)[-1500:]}")
            continue
        rec = json.loads(line[len("RESULT "):])
        rows.append(rec)
        print(json.dumps(rec))
    if rows:
        print("\n| streams | res | fps total | fps/stream | ms/tick | MB/tick |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['n_streams']} | {r['resolution']} | {r['fps_total']}"
                  f" | {r['fps_per_stream']} | {r['ms_per_tick']}"
                  f" | {r['hbm_mb_per_tick']} |")


if __name__ == "__main__":
    main()

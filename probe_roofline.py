"""Roofline audit of the headline tick (VERDICT r2 #3).

Compiles the EXACT headline program (8×1080p device-sim tick: synth-YUYV →
packed BGR decode → gray → Pallas blur/Sobel → rect overlay → outputs) on
the real chip and extracts XLA's own accounting: per-buffer output sizes,
peak allocation, and — from the compiled HLO — every fusion's operand/
result bytes, giving a defensible HBM-traffic estimate to divide by the
chip's HBM bandwidth. Prints one JSON line; details land in
docs/PERFORMANCE.md.
"""

import json
import re
import sys

import numpy as np


def main(run_timing: bool = True) -> None:
    import jax

    from rustcv_tpu.capture import SimulationDriver
    from rustcv_tpu.core import PixelFormat, SimpleConfig
    from rustcv_tpu.runtime import MultiStreamEngine

    n = 8
    eng = MultiStreamEngine(
        SimulationDriver(device_count=n, paced=False), n,
        SimpleConfig(width=1920, height=1080, fps=60, pixel_format=PixelFormat.YUYV),
        filter="blur_sobel", overlay=True, device_sim=True,
    )
    rects = np.tile(np.array([[100, 100, 400, 300]], np.int32), (n, 1))
    colors = np.tile(np.array([[0, 255, 0]], np.uint8), (n, 1))

    args = (
        jax.numpy.zeros(n, jax.numpy.int32),
        jax.numpy.asarray(rects),
        jax.numpy.asarray(colors),
        jax.numpy.int32(2),
    )
    lowered = eng._sim_fn.lower(*args)
    compiled = lowered.compile()

    res = {"metric": "headline_roofline"}
    try:
        ma = compiled.memory_analysis()
        for k in (
            "output_size_in_bytes", "temp_size_in_bytes",
            "argument_size_in_bytes", "generated_code_size_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                res[k] = int(v)
    except Exception as e:  # noqa: BLE001
        res["memory_analysis_error"] = str(e)[:200]

    # HLO traffic estimate: sum operand+result bytes of every top-level
    # fusion/custom-call in the entry computation (what actually reads and
    # writes HBM — intra-fusion values stay in registers/VMEM).
    text = compiled.as_text()
    res["hlo_bytes"] = len(text)

    def shape_bytes(sh: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", sh)
        if not m:
            return 0
        dt, dims = m.group(1), m.group(2)
        sizes = {
            "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
            "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
            "f64": 8,
        }
        b = sizes.get(dt, 4)
        count = 1
        for d in dims.split(","):
            if d:
                count *= int(d)
        return b * count

    # Entry computation lines like: %fusion.N = TYPE[...] fusion(...)
    traffic = 0
    fusions = 0
    entry = text.split("ENTRY", 1)[-1]
    for line in entry.splitlines():
        mm = re.search(r"=\s+((?:\([^)]*\))|(?:\w+\[[\d,]*\][^ ]*))\s+(fusion|custom-call|copy|bitcast-convert|transpose)\(", line)
        if not mm:
            continue
        kind = mm.group(2)
        if kind == "bitcast-convert":
            continue
        out_sh = mm.group(1)
        out_b = sum(shape_bytes(s) for s in re.findall(r"\w+\[[\d,]*\]", out_sh))
        in_b = 0
        argpart = line[mm.end():]
        for s in re.findall(r"\w+\[[\d,]*\]", argpart):
            in_b += shape_bytes(s)
        traffic += out_b + in_b
        fusions += 1
    res["estimated_hbm_traffic_mb"] = round(traffic / 1e6, 1)
    res["top_level_ops"] = fusions
    # v5e HBM ~819 GB/s
    res["roofline_ms_at_819GBs"] = round(traffic / 819e9 * 1e3, 3)

    if run_timing:
        import time

        out = eng._sim_fn(*args)
        np.asarray(out["_sync"])
        x = args[0]
        t0 = time.perf_counter()
        iters = 64
        for _ in range(iters):
            out = eng._sim_fn(x, *args[1:])
            x = out["_next_seqs"]
        np.asarray(out["_sync"])
        res["measured_ms_per_tick"] = round((time.perf_counter() - t0) / iters * 1e3, 3)

    eng.close()
    print(json.dumps(res))

    # Dump the biggest fusions for the docs (stderr, human-readable).
    lines = []
    for line in entry.splitlines():
        mm = re.search(r"=\s+((?:\([^)]*\))|(?:\w+\[[\d,]*\][^ ]*))\s+fusion\(", line)
        if mm:
            b = sum(shape_bytes(s) for s in re.findall(r"\w+\[[\d,]*\]", line))
            name = line.strip().split(" ")[0]
            lines.append((b, name))
    lines.sort(reverse=True)
    for b, name in lines[:12]:
        print(f"  {b/1e6:8.1f} MB  {name}", file=sys.stderr)


if __name__ == "__main__":
    main(run_timing="--no-timing" not in sys.argv)

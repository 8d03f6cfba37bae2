"""Diagnose + mitigate the >8-stream decline (VERDICT r4 #4).

The measured curve (probe_scaling.py, r4): per-chip aggregate peaks at
8x1080p (3 879 fps) and DECLINES at 16 (-5%) and 32 (-21%). The r4
explanation ("spills XLA's scheduling sweet spot past ~116 MB/tick")
carried no evidence. This probe:

1. compiles the chained tick program at n = 8/16/32 and records XLA's own
   memory_analysis (temp/argument/output bytes) — if temp bytes grow
   super-linearly, the decline is HBM working-set pressure, not
   scheduling;
2. times the same chained programs (device-only, dispatch-amortized — the
   honest form: K in-program ticks per dispatch, full-reduction probe,
   one fetch at the end);
3. A/Bs the mitigation: the SAME 16/32-stream tick with the batch
   processed as sequential 8-stream sub-batches inside one program
   (``lax.map`` over [n/8, 8, ...]) — if 8 is the sweet spot, sub-ticking
   should restore the 8-stream per-stream rate.

Usage: python probe_subbatch.py            # real chip
       JAX_PLATFORMS=cpu python probe_subbatch.py --quick   # logic check
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

QUICK = "--quick" in sys.argv
W, H = (256, 144) if QUICK else (1920, 1080)
CHAIN = 4 if QUICK else 16
DISPATCHES = 2 if QUICK else 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rustcv_tpu.core import PixelFormat
    from rustcv_tpu.ops import synth as _synth
    from rustcv_tpu.runtime.pipeline import PipelineSpec, get_pipeline

    # stencil_impl: XLA, deliberately — the Mosaic (pallas) stencil inside
    # a lax.scan chain HANGS the axon remote compiler (>35 min, never
    # returns; the same program compiles on CPU XLA in 4 s — r5 finding,
    # logged in docs/PERFORMANCE.md). The >8-stream scheduling question
    # is about XLA batch-width behavior and does not need the pallas
    # kernel; bench.py's unchained headline keeps pallas coverage.
    spec = PipelineSpec(
        pixel_format=PixelFormat.YUYV, width=W, height=H,
        filter="blur_sobel", overlay=True, stencil_impl="xla",
    )
    pipeline = get_pipeline(spec)

    def tick_probe(s, r, c, th):
        raw = _synth.synth_raw(s, W, H, PixelFormat.YUYV)
        out = pipeline(raw, r, c, th)
        probe = jnp.int32(0)
        for key, v in out.items():
            if key != "_sync":
                probe = probe + v.astype(jnp.int32).sum()
        return probe

    def build(n: int, sub: int | None):
        """Chained program: CHAIN in-program ticks, optional sub-batching."""

        def run(seqs, rects, colors, th):
            def body(s, _):
                if sub is None:
                    probe = tick_probe(s, rects, colors, th)
                else:
                    k = n // sub
                    probes = jax.lax.map(
                        lambda a: tick_probe(a[0], a[1], a[2], th),
                        (s.reshape(k, sub),
                         rects.reshape(k, sub, 4),
                         colors.reshape(k, sub, 3)))
                    probe = probes.sum()
                return s + 1, probe

            final, probes = jax.lax.scan(body, seqs, None, length=CHAIN)
            return {"_sync": probes.sum()[None], "_next_seqs": final}

        return jax.jit(run)

    def measure(n: int, sub: int | None):
        fn = build(n, sub)
        seqs = jnp.arange(n, dtype=jnp.int32)
        rects = jnp.tile(jnp.asarray([[100, 100, 400, 300]], jnp.int32),
                         (n, 1))
        colors = jnp.tile(jnp.asarray([[0, 255, 0]], jnp.uint8), (n, 1))
        th = jnp.int32(2)
        lowered = fn.lower(seqs, rects, colors, th)
        compiled = lowered.compile()
        try:
            ma = compiled.memory_analysis()
            mem = {
                "temp_mb": round(ma.temp_size_in_bytes / 1e6, 1),
                "output_mb": round(ma.output_size_in_bytes / 1e6, 1),
                "argument_mb": round(ma.argument_size_in_bytes / 1e6, 1),
            }
        except Exception as e:  # backend without the API
            mem = {"error": str(e)[:120]}
        # warm + honest timing: dispatch DISPATCHES chained calls
        # back-to-back (each feeds the clock forward), fetch the LAST
        # _sync — through the tunnel only a data fetch is a true barrier.
        out = fn(seqs, rects, colors, th)
        np.asarray(out["_sync"])  # warm fetch
        t0 = time.perf_counter()
        cur = out["_next_seqs"]
        for _ in range(DISPATCHES):
            out = fn(cur, rects, colors, th)
            cur = out["_next_seqs"]
        np.asarray(out["_sync"])
        dt = time.perf_counter() - t0
        ticks = DISPATCHES * CHAIN
        ms_tick = dt / ticks * 1e3
        rec = {
            "n": n, "sub": sub, "ms_per_tick": round(ms_tick, 3),
            "fps_total": round(n * 1e3 / ms_tick, 1),
            "fps_per_stream": round(1e3 / ms_tick, 1),
            "mem": mem,
        }
        print("RESULT " + json.dumps(rec), flush=True)
        return rec

    rows = []
    for n in (8, 16, 32):
        rows.append(measure(n, None))
    for n in (16, 32):
        rows.append(measure(n, 8))
    # summary
    base = rows[0]
    print(f"\n{'n':>3} {'sub':>4} {'ms/tick':>9} {'fps_total':>10} "
          f"{'vs 8-mono':>9}  temp_mb")
    for r in rows:
        rel = r["fps_total"] / (base["fps_total"] * r["n"] / 8)
        print(f"{r['n']:>3} {str(r['sub']):>4} {r['ms_per_tick']:>9} "
              f"{r['fps_total']:>10} {rel:>8.2%}  "
              f"{r['mem'].get('temp_mb', '?')}")


if __name__ == "__main__":
    main()

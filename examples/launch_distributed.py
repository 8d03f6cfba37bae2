"""Multi-host / multi-chip launch — turnkey script for real TPU pods.

Architecture (How-to-Scale-Your-Model recipe): camera streams are
embarrassingly parallel, so the scaling layout is stream-DP — each process
(TPU host) runs the fused engine over its LOCAL chips with the stream axis
sharded across them; ICI/DCN collectives are only touched for fleet-wide
metrics (a psum over the global mesh). No frame data ever crosses hosts.

Run on every host of a pod slice (example: v5e-16, 4 hosts × 4 chips):

    python examples/launch_distributed.py \
        --coordinator 10.0.0.2:8476 --num-processes 4 --process-id $ID \
        --streams-per-chip 8 --ticks 300

Single-process smoke (no coordinator; also what CI exercises):

    python examples/launch_distributed.py --ticks 20

Sizing table (MEASURED single-chip scaling curve, probe_scaling.py r4 —
docs/BENCH_SNAPSHOT.md; stream-DP adds no cross-chip dependencies, so
aggregate is linear in chips at a fixed per-chip batch):

    streams/chip   per-chip fps   fps/stream   ms/tick   MB/tick
         1            1 620         1 620        0.62       15
         2            2 070         1 035        0.97       29
         4            3 051           763        1.31       58
         8            3 879           485        2.06      116   <- peak
        16            3 675           230        4.35      232
        32            3 072            96       10.42      465

Per-chip aggregate SATURATES at 8×1080p and DECLINES beyond (measured:
16 streams −5%, 32 −21%) — size fleets at ≤8 streams/chip and add chips,
never batch wider: 4 chips × 8 ≈ 15 500 fps; 16 chips × 8 ≈ 62 000 fps.
At 4K the same rule gives 8 streams/chip ≈ 808 fps aggregate (101
fps/stream).

The fleet psum costs one i32 all-reduce per reporting interval (~µs on
ICI) — invisible at these rates. Numbers assume the device-resident
simulation source (device_sim=True, zero H2D steady state); live-camera
ingest is bounded by each host's capture hardware instead.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (omit for single-process)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--streams-per-chip", type=int, default=8)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--ticks", type=int, default=300)
    p.add_argument("--filter", default="blur_sobel")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for the virtual-"
                        "device rehearsal; the config API is required — the "
                        "ambient env may pin a TPU plugin before env vars "
                        "are read)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    from rustcv_tpu.capture import SimulationDriver
    from rustcv_tpu.core import PixelFormat, SimpleConfig
    from rustcv_tpu.parallel import stream_mesh
    from rustcv_tpu.runtime import MultiStreamEngine

    local = jax.local_devices()
    n_streams = args.streams_per_chip * len(local)
    mesh = stream_mesh(local)

    eng = MultiStreamEngine(
        SimulationDriver(device_count=n_streams, paced=False), n_streams,
        SimpleConfig(width=args.width, height=args.height, fps=60,
                     pixel_format=PixelFormat.YUYV),
        filter=args.filter, overlay=True, device_sim=True, mesh=mesh,
    )
    rects = np.tile(np.array([[100, 100, 400, 300]], np.int32), (n_streams, 1))
    colors = np.tile(np.array([[0, 255, 0]], np.uint8), (n_streams, 1))

    stats = eng.run(args.ticks, warmup=5, measure_latency=False,
                    rects=rects, rect_colors=colors)
    local_fps = stats.fps_total

    # Fleet aggregate: one psum over the GLOBAL mesh (every process
    # contributes its local rate). In single-process mode this is a no-op
    # reduction over the local mesh.
    if args.num_processes > 1:
        gmesh = stream_mesh(jax.devices(), axis="fleet")
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.make_array_from_callback(
            (len(jax.devices()),),
            NamedSharding(gmesh, P("fleet")),
            lambda idx: np.full(
                (1,), local_fps / len(local), np.float32
            ),
        )
        total_fps = float(jax.jit(lambda v: v.sum())(x))
    else:
        total_fps = local_fps

    eng.close()
    if args.process_id == 0:
        print(
            {
                "processes": args.num_processes,
                "chips": len(jax.devices()),
                "streams": n_streams * args.num_processes,
                "resolution": f"{args.width}x{args.height}",
                "local_fps": round(local_fps, 1),
                "fleet_fps": round(total_fps, 1),
                "fps_per_stream": round(stats.fps_per_stream, 2),
            }
        )


if __name__ == "__main__":
    main()

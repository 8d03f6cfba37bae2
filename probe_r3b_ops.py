"""Real-chip perf probe for the round-3b device ops (corner family,
SLIC, TV-L1, generalized-Hough accumulate).

Honest-timing rules (CLAUDE.md): dependent chains / dispatch-N-fetch-
last. Prints one JSON line per op.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(x)


def time_chained(fn, x0, n=10, warmup=1):
    x = x0
    for _ in range(warmup):
        x = fn(x)
    fetch(jnp.ravel(x)[:1])
    x = x0
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    fetch(jnp.ravel(x)[:1])
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    out = {}

    from rustcv_tpu.ops import corner, ghough, slic, tvl1

    g1080 = jnp.asarray(rng.integers(0, 256, (1080, 1920), np.uint8))

    def mev(x):
        r = corner.corner_min_eigen_val(x, 3, 3)
        return (x.astype(jnp.int32)
                + (r.sum() * 0).astype(jnp.int32)).astype(jnp.uint8)

    out["corner_min_eigen_val_1080p_ms"] = round(
        time_chained(mev, g1080), 2)
    print(json.dumps(out), flush=True)

    def pcd(x):
        r = corner.pre_corner_detect(x)
        return (x.astype(jnp.int32)
                + (r.sum() * 0).astype(jnp.int32)).astype(jnp.uint8)

    out["pre_corner_detect_1080p_ms"] = round(time_chained(pcd, g1080), 2)
    print(json.dumps(out), flush=True)

    bgr = jnp.asarray(rng.integers(0, 256, (480, 640, 3), np.uint8))

    def sl(x):
        lab = slic.slic_device(x, region_size=20, num_iterations=10)
        return (x.astype(jnp.int32)
                + (lab.sum() * 0).astype(jnp.int32)).astype(jnp.uint8)

    out["slic_vga_s20_it10_ms"] = round(time_chained(sl, bgr, n=5), 2)
    print(json.dumps(out), flush=True)

    stack = jnp.asarray(rng.integers(0, 256, (3, 480, 640), np.uint8))

    def tv(x):
        d = tvl1.denoise_tvl1(x, lam=1.0, niters=30)
        return (x.astype(jnp.int32)
                + (d.sum() * 0).astype(jnp.int32)).astype(jnp.uint8)

    out["tvl1_vga_3obs_30it_ms"] = round(time_chained(tv, stack, n=5), 2)
    print(json.dumps(out), flush=True)

    tmpl = np.full((32, 32), 40, np.uint8)
    for y in range(6, 26):
        tmpl[y, 6:6 + (y - 5)] = 210
    table = ghough.build_r_table(tmpl)
    gvga = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    tj = jnp.asarray(np.asarray(table, np.int32))

    def gh(x):
        acc = ghough._accumulate_device(x, tj, int(len(table)))
        return (x.astype(jnp.int32)
                + (acc.sum() * 0).astype(jnp.int32)).astype(jnp.uint8)

    out[f"ghough_vga_{len(table)}entries_ms"] = round(
        time_chained(gh, gvga, n=5), 2)

    out["platform"] = jax.devices()[0].platform
    print(json.dumps(out))


if __name__ == "__main__":
    main()

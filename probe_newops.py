"""Real-chip perf probe for the round-3 op additions (SGBM, NL-means,
HOG, MOSSE/KCF steps, stitch compositing, DCT).

Honest-timing rules (CLAUDE.md): dependent chains / dispatch-N-fetch-last;
never repeated-same-call timings. Prints one JSON line per op.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(x)


def _probe_leaf(x):
    """A small real-typed leaf of x to fetch as the sync barrier."""
    if hasattr(x, "center"):          # tracker states
        return x.center
    if isinstance(x, tuple):
        x = x[0]
    return jnp.ravel(x)[:1]


def time_chained(fn, x0, n=10, warmup=1):
    """fn: x -> x-like (dependency-chained). Returns ms per call."""
    x = x0
    for _ in range(warmup):
        x = fn(x)
    fetch(_probe_leaf(x))
    x = x0
    t0 = time.time()
    for _ in range(n):
        x = fn(x)
    fetch(_probe_leaf(x))
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)

    # --- SGBM VGA D=64 ----------------------------------------------------
    from rustcv_tpu.ops import sgbm
    lft = rng.integers(0, 256, (480, 640)).astype(np.uint8)
    rgt = np.roll(lft, 5, axis=1)
    lj, rj = jnp.asarray(lft), jnp.asarray(rgt)

    def sg(x):
        d, v = sgbm.stereo_sgbm(x, rj, num_disparities=64)
        # chain: next input depends on this output
        return (x.astype(jnp.int32) + (d.sum() * 0).astype(jnp.int32)) \
            .astype(jnp.uint8)

    ms = time_chained(jax.jit(sg), lj, n=5)
    print(json.dumps({"op": "stereo_sgbm_vga_d64_8dir", "ms": round(ms, 2)}), flush=True)

    # --- NL-means VGA 7/21 ------------------------------------------------
    from rustcv_tpu.ops import nlmeans
    img = rng.integers(0, 256, (480, 640)).astype(np.uint8)

    def nl(x):
        return nlmeans.nl_means(x)

    ms = time_chained(jax.jit(nl), jnp.asarray(img), n=5)
    print(json.dumps({"op": "nl_means_vga_7_21", "ms": round(ms, 2)}), flush=True)

    # --- HOG blocks + score map 1280x704 ---------------------------------
    from rustcv_tpu.ops import hog
    big = rng.integers(0, 256, (704, 1280)).astype(np.uint8)
    w = jnp.asarray(rng.normal(0, 1, 3780), jnp.float32)

    def hg(x):
        sm = hog.hog_score_map(x, w, jnp.float32(0.0))
        return (x.astype(jnp.float32) + sm.sum() * 0).astype(jnp.uint8)

    ms = time_chained(jax.jit(hg), jnp.asarray(big), n=10)
    print(json.dumps({"op": "hog_score_map_1280x704", "ms": round(ms, 2)}), flush=True)

    # --- MOSSE / KCF steps (state chains naturally) ----------------------
    from rustcv_tpu.ops import kcf as kcfm
    from rustcv_tpu.ops import tracker as trk
    frame = rng.integers(0, 256, (480, 640)).astype(np.uint8)
    fj = jnp.asarray(frame)

    st = trk.init(frame, (300, 200, 64, 64))
    def ms_step(s):
        s2, _, _ = trk.step(s, fj)
        return s2
    ms = time_chained(ms_step, st, n=20)
    print(json.dumps({"op": "mosse_step_64x64_in_vga", "ms": round(ms, 2)}), flush=True)

    st2 = kcfm.init(frame, (300, 200, 64, 64))
    def kc_step(s):
        s2, _, _ = kcfm.step(s, fj)
        return s2
    ms = time_chained(kc_step, st2, n=20)
    print(json.dumps({"op": "kcf_step_64x64_in_vga", "ms": round(ms, 2)}), flush=True)

    # --- DCT 1080p --------------------------------------------------------
    from rustcv_tpu.ops import transform
    a = rng.normal(0, 1, (1088, 1920)).astype(np.float32)

    def dc(x):
        return transform.dct(transform.dct(x), inverse=True)

    ms = time_chained(jax.jit(dc), jnp.asarray(a), n=10)
    print(json.dumps({"op": "dct2_roundtrip_1080p", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()

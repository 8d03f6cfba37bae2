"""Compile-probe Mosaic lane-shuffle primitives on the real chip.

The packed-BGR byte interleave needs SOME in-kernel lane shuffle
(VERDICT r3 #2: XLA's lowering costs ~430 MB/tick of relayout copies).
Each candidate primitive is compiled + numerically checked in its own
subprocess so a Mosaic SIGABRT cannot take down the probe driver.

Usage: python probe_mosaic_shuffle.py [name ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

CASES = {
    # strided lane load: even-lane compaction
    "strided_load": r"""
def kern(x_ref, o_ref):
    o_ref[...] = x_ref[:, ::2]
x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
out = call(kern, (8, 128), jnp.int32, x)
ref = np.asarray(x)[:, ::2]
""",
    # strided lane store: 3-phase scatter
    "strided_store": r"""
def kern(x_ref, o_ref):
    o_ref[:, ::3] = x_ref[...]
    o_ref[:, 1::3] = x_ref[...] + 1
    o_ref[:, 2::3] = x_ref[...] + 2
x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
out = call(kern, (8, 384), jnp.int32, x)
ref = np.zeros((8, 384), np.int32)
ref[:, ::3] = np.asarray(x); ref[:, 1::3] = np.asarray(x) + 1
ref[:, 2::3] = np.asarray(x) + 2
""",
    # dynamic lane gather with an iota//3 pattern (j -> j//3)
    "lane_gather": r"""
def kern(x_ref, o_ref):
    idx = jax.lax.broadcasted_iota(jnp.int32, (8, 384), 1) // 3
    o_ref[...] = jnp.take_along_axis(x_ref[...][:, :384], idx, axis=1)
x = jnp.arange(8 * 384, dtype=jnp.int32).reshape(8, 384)
out = call(kern, (8, 384), jnp.int32, x)
ref = np.asarray(x)[:, (np.arange(384) // 3)]
""",
    # u8 elementwise select on full-lane vectors
    "u8_select": r"""
def kern(x_ref, y_ref, o_ref):
    m = (jax.lax.broadcasted_iota(jnp.int32, (8, 384), 1) % 3) == 0
    o_ref[...] = jnp.where(m, x_ref[...], y_ref[...])
x = jnp.full((8, 384), 7, jnp.uint8)
y = jnp.full((8, 384), 9, jnp.uint8)
out = call(kern, (8, 384), jnp.uint8, x, y)
i = np.arange(384) % 3 == 0
ref = np.where(i[None, :], 7, 9).astype(np.uint8)
ref = np.broadcast_to(ref, (8, 384))
""",
    # sublane bitcast u32 -> u8 (4 sublanes per word)
    "sublane_bitcast": r"""
def kern(x_ref, o_ref):
    o_ref[...] = pltpu.bitcast(x_ref[...], jnp.uint8)
x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
out = call(kern, (32, 128), jnp.uint8, x)
xv = np.asarray(x)
ref = np.zeros((32, 128), np.uint8)
for s in range(32):
    ref[s] = (xv[s // 4] >> (8 * (s % 4))).astype(np.uint8)
""",
    # lane roll (cyclic shift along lanes)
    "lane_roll": r"""
def kern(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 1, 1)
x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
out = call(kern, (8, 128), jnp.int32, x)
ref = np.roll(np.asarray(x), 1, axis=1)
""",
    # i32 -> u8 truncating astype on full vectors
    "u8_astype": r"""
def kern(x_ref, o_ref):
    o_ref[...] = (x_ref[...] & 255).astype(jnp.uint8)
x = jnp.arange(8 * 384, dtype=jnp.int32).reshape(8, 384)
out = call(kern, (8, 384), jnp.uint8, x)
ref = (np.asarray(x) & 255).astype(np.uint8)
""",
    # single-vreg dynamic gather, idx shape == src shape (the Pallas
    # lowering asserts this; 128 -> 128 lanes)
    "gather_128": r"""
def kern(x_ref, o_ref):
    idx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) // 3
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx, axis=1)
x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
out = call(kern, (8, 128), jnp.int32, x)
ref = np.asarray(x)[:, (np.arange(128) // 3)]
""",
    # unaligned static lane slice (Mosaic internal roll+select)
    "unaligned_slice": r"""
def kern(x_ref, o_ref):
    o_ref[...] = x_ref[:, 42:170]
x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
out = call(kern, (8, 128), jnp.int32, x)
ref = np.asarray(x)[:, 42:170]
""",
    # i32 -> u16 truncating astype
    "u16_astype": r"""
def kern(x_ref, o_ref):
    o_ref[...] = (x_ref[...] & 0xFFFF).astype(jnp.uint16)
x = (jnp.arange(8 * 384, dtype=jnp.int32) * 257).reshape(8, 384)
out = call(kern, (8, 384), jnp.uint16, x)
ref = ((np.asarray(x)) & 0xFFFF).astype(np.uint16)
""",
    # pltpu.repeat lane semantics (element-repeat or tile?)
    "repeat_lanes": r"""
def kern(x_ref, o_ref):
    o_ref[...] = pltpu.repeat(x_ref[...], 3, 1)
x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
out = call(kern, (8, 384), jnp.int32, x)
ref = np.repeat(np.asarray(x), 3, axis=1)  # element-repeat hypothesis
""",
    # FULL stride-3 interleave, per-output-vreg: unaligned 128-lane
    # source slices + shape-matched gathers + mod-3 selects.
    # out[:, 3m+s] = w_s[:, m] for planes of 128 lanes -> out 384 lanes.
    "interleave3_vreg": r"""
P = 128
def kern(w0_ref, w1_ref, w2_ref, o_ref):
    ws = (w0_ref[...], w1_ref[...], w2_ref[...])
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for v in range(3):  # 3 output vregs
        a = (128 * v) // 3
        idx = (lane + 128 * v) // 3 - a
        mod = (lane + 128 * v) % 3
        parts = [jnp.take_along_axis(
                     jax.lax.dynamic_slice(wsrc, (0, a), (8, 128)),
                     idx, axis=1) for wsrc in ws]
        o_ref[:, 128 * v:128 * (v + 1)] = (
            jnp.where(mod == 0, parts[0],
                      jnp.where(mod == 1, parts[1], parts[2]))
            & 0xFFFF).astype(jnp.uint16)
ws = [(jnp.arange(8 * P, dtype=jnp.int32) + 10000 * s).reshape(8, P)
      for s in range(3)]
out = call(kern, (8, 3 * P), jnp.uint16, *ws)
ref = np.zeros((8, 3 * P), np.uint16)
for s in range(3):
    ref[:, s::3] = (np.asarray(ws[s]) & 0xFFFF).astype(np.uint16)
""",
    # u16 pack + bitcast path (the SIGABRT suspect)
    "u16_ops": r"""
def kern(x_ref, o_ref):
    w = (x_ref[...] & 255).astype(jnp.uint16)
    o_ref[...] = w | (w << 8)
x = jnp.arange(8 * 384, dtype=jnp.int32).reshape(8, 384)
out = call(kern, (8, 384), jnp.uint16, x)
v = (np.asarray(x) & 255).astype(np.uint16)
ref = v | (v << 8)
""",
}

_TMPL = r"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def call(kern, out_shape, out_dtype, *args):
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
    )(*args)

{body}
ok = (np.asarray(out) == ref).all()
print("CASE_RESULT", {name!r}, "exact" if ok else "MISMATCH")
"""


def main() -> None:
    todo = sys.argv[1:] or list(CASES)
    for name in todo:
        code = _TMPL.format(body=CASES[name], name=name)
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=900,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("CASE_RESULT")), None)
        if line:
            print(line)
        else:
            tail = (p.stderr or p.stdout)[-600:].replace("\n", " | ")
            print(f"CASE_RESULT {name!r} FAILED rc={p.returncode}: {tail}")


if __name__ == "__main__":
    main()

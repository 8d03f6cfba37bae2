"""Pallas fused stencil kernel: 5×5 Gaussian + Sobel 3×3 + |∇| in one pass.

The XLA path (ops/filters.py) materializes intermediates between the blur
and Sobel stages; this kernel keeps the whole stencil chain in VMEM — one
HBM read of the (padded) gray input, one HBM write of the magnitude — the
speed-of-light traffic for the op. Bit-exact with the golden chain
``gaussian5_u8 → sobel3_gray → gradient_magnitude_u8``, including its
two-stage border rule: the Gaussian replicates the *original* at its border,
then Sobel replicates the *blurred* image at its border — so the kernel
computes blur only at valid centers and explicitly replicates blurred edge
rows/cols before the Sobel taps.

Layout: gray frames ``[N, H, W]`` u8, W on lanes. The caller pads
spatially with replicate(2) + lane alignment; the kernel tiles rows per grid
step (tile height must divide H — the wrapper picks a divisor), each step
DMA-ing an overlapping ``(TH+6, Wp)`` window from ANY/HBM.

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAUSS_R = 2
SOBEL_R = 1
HALO = GAUSS_R + SOBEL_R  # input rows needed beyond each output edge
RPAD = 4  # rows actually padded per side: DMA slices must be 8-row aligned,
#           so each tile window is th + 2*RPAD (≡ 0 mod 8) with 1 spare row
V_OFF = RPAD - HALO
_G5 = (1, 4, 6, 4, 1)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _clamp_tile_rows(tile_rows: int, h: int, wp: int) -> int:
    """Largest safe tile height (multiple of 8) for this padded width.

    Peak scoped VMEM ≈ 24 bytes/row/lane-column (measured: th=256 at
    wp=3968 allocates 24.55 MB ≈ 95 KB/row against the 16 MB limit — the
    int32 blur/Sobel intermediates dominate). Clamping here turns a
    compile-time VMEM OOM on wide images into a working smaller tile."""
    budget_rows = max(8, (15_000_000 // (24 * wp)) // 8 * 8)
    th = min(_round_up(tile_rows, 8), _round_up(h, 8), budget_rows)
    return th


def _taps_h(a, weights, width, start):
    acc = None
    for k, w in enumerate(weights):
        if w == 0:
            continue
        sl = a[:, start + k : start + k + width]
        term = sl if w == 1 else w * sl
        acc = term if acc is None else acc + term
    return acc


def _taps_v(a, weights, height, start):
    acc = None
    for k, w in enumerate(weights):
        if w == 0:
            continue
        sl = a[start + k : start + k + height, :]
        term = sl if w == 1 else w * sl
        acc = term if acc is None else acc + term
    return acc


def _kernel(in_hbm, out_ref, *, th: int, w: int, wp: int, n_tiles: int, rem: int):
    """One (batch, row-tile) step.

    Input window rows [j*th, j*th + th + 2*RPAD) of the replicate-padded
    image; its row v corresponds to image row j*th + v - RPAD.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body(scratch, bl_ref, sem):
        dma = pltpu.make_async_copy(
            in_hbm.at[i, pl.ds(j * th, th + 2 * RPAD), :], scratch, sem
        )
        dma.start()
        dma.wait()
        a = scratch[:].astype(jnp.int32)  # (TH+6, Wp); cols: image col c ↦ c+2

        # Gaussian at VALID centers only: rows covering [tile_start-1,
        # tile_start+TH+1) (the Sobel halo), cols covering [-1, W+1) — but
        # edge centers (-1, W) are invalid; compute the valid width W and
        # replicate after. Window row v corresponds to center image row
        # j*th + v - 1; horizontal start 0 → center col 0.
        tmp = _taps_h(a, _G5, w, 0)                       # centers cols [0, W)
        acc = _taps_v(tmp, _G5, th + 2, V_OFF)            # centers rows [-1, TH+1)
        blur = (acc + 128) >> 8                           # (TH+2, W)

        # Assemble Sobel input (TH+2, W+2) with replicated blurred borders.
        bl_ref[:, 1 : w + 1] = blur
        bl_ref[:, 0] = blur[:, 0]
        bl_ref[:, w + 1] = blur[:, w - 1]

        # Vertical: row 0 is center image-row (tile_start-1) — invalid only
        # for the first tile; center image-row h (one past the real bottom
        # edge, at static offset rem+1 inside the last tile) is invalid only
        # for the last tile. Golden replicates the blurred edge row there.
        @pl.when(j == 0)
        def _():
            bl_ref[0, :] = bl_ref[1, :]

        @pl.when(j == n_tiles - 1)
        def _():
            bl_ref[rem + 1, :] = bl_ref[rem, :]

        b = bl_ref[:]
        smooth_v = _taps_v(b, (1, 2, 1), th, 0)
        diff_v = _taps_v(b, (-1, 0, 1), th, 0)
        gx = _taps_h(smooth_v, (-1, 0, 1), w, 0)
        gy = _taps_h(diff_v, (1, 2, 1), w, 0)

        mag2 = gx * gx + gy * gy
        s = jnp.sqrt(mag2.astype(jnp.float32)).astype(jnp.int32)
        s = jnp.where((s + 1) * (s + 1) <= mag2, s + 1, s)
        s = jnp.where(s * s > mag2, s - 1, s)
        out_ref[0, :, :] = jnp.minimum(s, 255).astype(jnp.uint8)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((th + 2 * RPAD, wp), jnp.uint8),
        bl_ref=pltpu.VMEM((th + 2, w + 2), jnp.int32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, static_argnames=("tile_rows",))
def blur_sobel_mag_pallas(gray: jax.Array, tile_rows: int = 128) -> jax.Array:
    """Fused Gaussian5 + Sobel + |∇| on u8 gray [N, H, W] (or [H, W]) → u8."""
    squeeze = gray.ndim == 2
    if squeeze:
        gray = gray[None]
    n, h, w = gray.shape
    # Mosaic requires output block rows ≡ 0 (mod 8) (or the full dim).
    wp = _round_up(w + 2 * GAUSS_R, 128)
    th = _clamp_tile_rows(tile_rows, h, wp)
    n_tiles = -(-h // th)
    h_pad = n_tiles * th
    rem = h - (n_tiles - 1) * th  # valid rows in the last tile (static)
    # Replicate-pad: rows by HALO each side plus the ceil-tiling remainder at
    # the bottom (those extra output rows are garbage and cropped); cols by
    # GAUSS_R, then zeros to lane alignment. The through-padding edge-center
    # values are never used — blur is computed at valid centers and edges are
    # explicitly replicated in-kernel.
    padded = jnp.pad(
        gray,
        [(0, 0), (RPAD, RPAD + (h_pad - h)), (GAUSS_R, wp - w - GAUSS_R)],
        mode="edge",
    )

    out = pl.pallas_call(
        partial(_kernel, th=th, w=w, wp=wp, n_tiles=n_tiles, rem=rem),
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_pad, w), jnp.uint8),
        interpret=_interpret(),
    )(padded)
    out = out[:, :h, :]
    return out[0] if squeeze else out

"""Device-mesh helpers — shard the stream batch across chips.

The reference is single-process with no distributed layer (SURVEY.md §2.7);
scaling out is dual-camera examples run by hand. TPU-native scaling: the
stream/batch axis is the data-parallel axis. A 1-D mesh over all devices with
inputs sharded ``P('stream')`` makes every pipeline stage embarrassingly
parallel (no collectives — stencils never cross stream boundaries), so XLA
executes the same fused program per chip over its shard; ICI is only touched
if a reduction over streams is requested (e.g. fleet-wide corner counts via
``psum``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map


def stream_mesh(devices: Optional[Sequence] = None, axis: str = "stream") -> Mesh:
    """A 1-D mesh over ``devices`` (default: all) named for the stream axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def grid_mesh(
    n_streams: int,
    n_rows: int,
    devices: Optional[Sequence] = None,
    axes: Sequence[str] = ("stream", "rows"),
) -> Mesh:
    """A 2-D (streams × rows) mesh: the outer axis data-parallels stream
    groups, the inner axis shards each frame's rows (spatial parallelism
    with ppermute halos — parallel/spatial.py). The inner axis varies
    fastest over the device list, so row-neighbor chips are ICI-adjacent
    on a physical torus slice."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size != n_streams * n_rows:
        raise ValueError(
            f"grid_mesh: {n_streams}x{n_rows} needs {n_streams * n_rows} "
            f"devices, got {devs.size}"
        )
    return Mesh(devs.reshape(n_streams, n_rows), tuple(axes))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [N, ...] batch over the mesh's first axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a host batch on the mesh, split along axis 0."""
    return jax.device_put(x, stream_sharding(mesh))


def corner_counts_psum(corner_mask, mesh: Mesh):
    """Example cross-chip reduction: total corners across all streams.

    Runs under ``shard_map`` so the per-chip partial sums reduce over ICI
    with a single ``psum``.
    """
    axis = mesh.axis_names[0]

    def local(m):
        return jax.lax.psum(m.sum().astype(jax.numpy.int32), axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(axis), out_specs=P(),
    )
    return fn(corner_mask)

"""Parallel execution: device meshes + stream-axis sharding."""

from .mesh import corner_counts_psum, replicated, shard_batch, stream_mesh, stream_sharding

__all__ = [
    "corner_counts_psum", "replicated", "shard_batch", "stream_mesh",
    "stream_sharding",
]

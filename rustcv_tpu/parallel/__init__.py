"""Parallel execution: device meshes + stream-axis sharding."""

from .mesh import corner_counts_psum, replicated, shard_batch, stream_mesh, stream_sharding
from .spatial import blur_sobel_mag_spatial

__all__ = [
    "blur_sobel_mag_spatial", "corner_counts_psum", "replicated",
    "shard_batch", "stream_mesh", "stream_sharding",
]

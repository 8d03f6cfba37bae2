"""Parallel execution: device meshes + stream-axis sharding."""

from .mesh import (
    corner_counts_psum, grid_mesh, replicated, shard_batch, stream_mesh,
    stream_sharding,
)
from .spatial import blur_sobel_mag_spatial, blur_sobel_mag_spatial_2d

__all__ = [
    "blur_sobel_mag_spatial", "blur_sobel_mag_spatial_2d",
    "corner_counts_psum", "grid_mesh", "replicated", "shard_batch",
    "stream_mesh", "stream_sharding",
]

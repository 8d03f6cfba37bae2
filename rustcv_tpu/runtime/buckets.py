"""Shape buckets — static-shape answer to dynamic resolution.

``set_resolution`` hot-swap (``rustcv/src/videoio/mod.rs:115-147``) conflicts
with XLA's compile-once model (SURVEY.md §7 hard-part #3). We pin the bucket
set to the reference's own preset tables (``bridge.m:236-241``,
``rustcv-backend-avf/src/stream.rs:281-289``) and ahead-of-time warm the
pipeline cache per bucket; a swap is then a cache lookup, not a recompile.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

SHAPE_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (352, 288), (640, 480), (1280, 720), (1920, 1080), (3840, 2160),
)


def bucket_for(width: int, height: int) -> Tuple[int, int]:
    """Closest bucket by L1 distance (the preset-selection rule the AVF
    backend uses, stream.rs:272-307)."""
    return min(SHAPE_BUCKETS, key=lambda b: abs(b[0] - width) + abs(b[1] - height))


def warm(specs: Iterable["object"], n_streams: int, devices: Optional[list] = None) -> int:
    """Pre-compile pipelines for the given specs; returns count compiled.

    Compilation happens lazily on first call otherwise; warming moves the
    ~seconds-long XLA compile out of the capture loop (the moral analog of
    the reference pre-allocating its mmap ring before STREAMON).
    """
    import numpy as np
    import jax

    from .pipeline import get_pipeline, make_dummy_overlay

    count = 0
    for spec in specs:
        fn = get_pipeline(spec)
        raw = np.zeros((n_streams, spec.raw_bytes()), np.uint8)
        rects, colors, th = make_dummy_overlay(n_streams)
        jax.block_until_ready(fn(jax.device_put(raw), rects, colors, th))
        count += 1
    return count

"""Runtime: batched multi-stream executor, fused pipelines, shape buckets."""

from .buckets import SHAPE_BUCKETS, bucket_for, warm
from .engine import EngineStats, MultiStreamEngine, TickResult
from .pipeline import PipelineSpec, get_pipeline, make_dummy_overlay

__all__ = [
    "SHAPE_BUCKETS", "EngineStats", "MultiStreamEngine", "PipelineSpec",
    "TickResult", "bucket_for", "get_pipeline", "make_dummy_overlay", "warm",
]

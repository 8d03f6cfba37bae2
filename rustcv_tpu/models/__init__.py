"""models — named end-to-end pipeline configurations.

The framework's "model zoo" is the set of vision pipelines the BASELINE
defines (BASELINE.json configs 1-5). Each model is a declarative bundle of
(stream config, PipelineSpec, overlay policy) that instantiates a ready
:class:`rustcv_tpu.runtime.MultiStreamEngine`. They serve as reproducible
benchmark configs and as copy-paste starting points for user pipelines.
"""

from .zoo import (
    MODELS,
    PipelineModel,
    config1_convert_overlay,
    config2_mjpeg_resize,
    config3_blur_sobel_4k,
    config4_harris_1080p,
    config5_end_to_end_4k,
    config6_transcode,
    get_model,
)

__all__ = [
    "MODELS", "PipelineModel", "config1_convert_overlay",
    "config2_mjpeg_resize", "config3_blur_sobel_4k", "config4_harris_1080p",
    "config5_end_to_end_4k", "config6_transcode", "get_model",
]

"""imgcodecs — imread / imwrite with BGR discipline.

Reference: ``rustcv/src/imgcodecs/mod.rs:9-76`` — ``imread`` decodes to RGB8
then repacks BGR; ``imwrite`` converts BGR→RGB honoring the Mat's stride
(``row_bytes``) before encoding. PIL replaces the Rust ``image`` crate.
"""

from __future__ import annotations

import os

from ..core.errors import CameraError
from ..core.mat import Mat


def imread(path: str) -> Mat:
    """Load an image file as a BGR Mat. Raises on missing/corrupt files."""
    import numpy as np
    from PIL import Image

    if not os.path.exists(path):
        raise CameraError(f"imread: no such file: {path}")
    try:
        img = Image.open(path).convert("RGB")
    except Exception as e:  # noqa: BLE001
        raise CameraError(f"imread: cannot decode {path}: {e}") from e
    rgb = np.asarray(img, dtype=np.uint8)
    return Mat.from_array(np.ascontiguousarray(rgb[..., ::-1]))


def imwrite(path: str, mat: Mat) -> bool:
    """Write a BGR Mat to an image file (format from the extension)."""
    from PIL import Image

    if mat.is_empty():
        return False
    bgr = mat.to_numpy()  # stride-aware packed copy (honors step)
    try:
        Image.fromarray(bgr[..., ::-1]).save(path)
    except (ValueError, OSError):
        return False
    return True


__all__ = ["imread", "imwrite"]

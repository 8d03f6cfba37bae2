"""cv2.barcode — EAN-13 detection/decoding over rustcv_tpu.ops.barcode."""
from __future__ import annotations

import numpy as np

from ..ops import barcode as _bc


class BarcodeDetector:
    """cv2.barcode.BarcodeDetector role (EAN-13; the reference scope of
    ops/barcode.py)."""

    def __init__(self, prototxt_path="", model_path=""):
        pass

    def detectAndDecode(self, img, points=None):
        res = _bc.detect_and_decode(np.asarray(img))
        if not res:
            return "", "", None
        return res[0], "EAN_13", None

    def detectAndDecodeWithType(self, img, points=None):
        return self.detectAndDecode(img, points)

    def detectAndDecodeMulti(self, img, points=None):
        res = _bc.detect_and_decode(np.asarray(img))
        if not res:
            return False, [], None, []
        return True, res, None, ["EAN_13"] * len(res)

    def decode(self, img, points):
        return self.detectAndDecode(img)[:1]

    def detect(self, img, points=None):
        ok = bool(_bc.detect_and_decode(np.asarray(img)))
        return ok, None

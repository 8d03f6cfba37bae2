"""cv2.aruco-compatible submodule over ops/aruco.py.

Dictionaries are self-generated (ops/aruco.Dictionary.generate — no
OpenCV data copied), so marker BITS differ from OpenCV's stock
dictionaries: markers drawn with this module are detected by this module
(and vice versa), but an OpenCV-printed DICT_4X4_50 sheet needs its
dictionary imported via ``Dictionary(bits)``.
"""
from __future__ import annotations

import numpy as np

from ..core.mat import Mat
from ..ops import aruco as _ar
from ._constants import *  # noqa: F401,F403 - DICT_* ids

_DICT_SPECS = {}
for _n in (50, 100, 250, 1000):
    for _bits in (4, 5, 6, 7):
        _DICT_SPECS[f"DICT_{_bits}X{_bits}_{_n}"] = (_bits, _n)


def _m(a):
    return a if isinstance(a, Mat) else \
        Mat.from_array(np.ascontiguousarray(a))


class Dictionary:
    def __init__(self, inner):
        self._d = inner


_cache = {}


def getPredefinedDictionary(dict_id):
    """Map a cv2 DICT_* id to a deterministically generated dictionary
    of the same marker size and capacity."""
    import rustcv_tpu.cv2._constants as C
    name = None
    for n in _DICT_SPECS:
        if getattr(C, n, None) == dict_id:
            name = n
            break
    if name is None:
        raise ValueError(f"unknown aruco dictionary id {dict_id}")
    if name not in _cache:
        bits, count = _DICT_SPECS[name]
        _cache[name] = Dictionary(_ar.Dictionary.generate(
            n=count, bits=bits, seed=dict_id))
    return _cache[name]


class DetectorParameters:
    def __init__(self):
        pass


class RefineParameters:
    def __init__(self, *a, **k):
        pass


class ArucoDetector:
    def __init__(self, dictionary, detectorParams=None,
                 refineParams=None):
        self._dict = dictionary

    def detectMarkers(self, image):
        arr = image.to_numpy() if isinstance(image, Mat) else \
            np.asarray(image)
        if arr.ndim == 3:
            arr = arr[..., 0] if arr.shape[2] == 1 else \
                np.asarray(_m(arr).to_numpy()[..., :3].mean(-1), np.uint8)
        corners, ids = _ar.detect_markers(arr, self._dict._d)
        cs = tuple(np.asarray(c, np.float32).reshape(1, 4, 2)
                   for c in corners)
        ids_arr = None if len(ids) == 0 else \
            np.asarray(ids, np.int32).reshape(-1, 1)
        return cs, ids_arr, ()


def detectMarkers(image, dictionary, parameters=None):
    return ArucoDetector(dictionary).detectMarkers(image)


def generateImageMarker(dictionary, id, sidePixels, img=None,
                        borderBits=1):
    """sidePixels is the full marker side (cv2 semantics); drawn at the
    largest integer cell size that fits, then nearest-upsampled to
    exactly sidePixels like cv2's generateImageMarker."""
    cells = dictionary._d.bits + 2
    cell_px = max(1, int(sidePixels) // cells)
    out = np.asarray(_ar.draw_marker(dictionary._d, int(id), cell_px),
                     np.uint8)
    if out.shape[0] != int(sidePixels):
        idx = (np.arange(int(sidePixels)) * out.shape[0]
               // int(sidePixels))
        out = out[np.ix_(idx, idx)]
    return out


def drawDetectedMarkers(image, corners, ids=None,
                        borderColor=(0, 255, 0)):
    from . import polylines as _polylines
    for i, c in enumerate(corners):
        pts = np.asarray(c, np.float32).reshape(4, 2).astype(np.int32)
        _polylines(image, [pts], True, borderColor, 1)
    return image


def estimatePoseSingleMarkers(corners, markerLength, cameraMatrix,
                              distCoeffs):
    rvecs, tvecs = [], []
    for c in corners:
        r, t = _ar.estimate_pose_single_markers(
            np.asarray(c, np.float64).reshape(4, 2), float(markerLength),
            np.asarray(cameraMatrix),
            np.zeros(5) if distCoeffs is None
            else np.asarray(distCoeffs, np.float64).ravel())
        rvecs.append(np.asarray(r).reshape(1, 3))
        tvecs.append(np.asarray(t).reshape(1, 3))
    return np.asarray(rvecs), np.asarray(tvecs), None

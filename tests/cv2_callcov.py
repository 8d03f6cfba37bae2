"""Argument synthesis for the cv2-facade call-coverage harness.

Every public callable in ``rustcv_tpu.cv2`` must be CALLED once by
tests/test_cv2_call_coverage.py (VERDICT r4 item 1: make the
raise-on-call bug class structurally extinct).  This module holds the
machinery: a parameter-name -> value synthesizer and a per-callable
override table for signatures the synthesizer cannot infer.

Inputs are tiny (<=64 px) so the whole sweep stays fast on one core.
"""
from __future__ import annotations

import inspect
import numpy as np

H, W = 32, 40


def _rng():
    return np.random.RandomState(7)


def img_u8(c=3, h=H, w=W):
    r = _rng()
    base = r.randint(0, 2, (h // 8, w // 8)).repeat(8, 0).repeat(8, 1)
    img = (base * 150 + r.randint(0, 90, (h, w))).astype(np.uint8)
    if c == 0:
        return img
    return np.stack([img] * c, -1) if c > 1 else img[..., None]


def gray_u8(h=H, w=W):
    return img_u8(0, h, w)


def img_f32(c=3, h=H, w=W):
    return img_u8(c, h, w).astype(np.float32) / 255.0


def mask_u8(h=H, w=W):
    m = np.zeros((h, w), np.uint8)
    m[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 255
    return m


def pts2f(n=12):
    r = _rng()
    return (r.rand(n, 1, 2) * [W - 1, H - 1]).astype(np.float32)


def pts3f(n=12):
    r = _rng()
    return (r.rand(n, 1, 3) * 2 - 1).astype(np.float32)


def contour():
    return np.array([[[5, 5]], [[30, 6]], [[32, 25]], [[8, 24]]],
                    np.int32)


def camK():
    return np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                    np.float64)


def dist5():
    return np.array([0.05, -0.02, 0.001, 0.001, 0.01], np.float64)


def term_criteria():
    return (3, 10, 0.01)   # COUNT|EPS, 10 iters, eps


# --------------------------------------------------------------------
# Parameter-name -> value factories.  Order matters: first match wins.
# Each entry: (predicate(name), factory()).
# --------------------------------------------------------------------

def _by_name(name: str):
    n = name
    table = {
        # images
        "src": lambda: img_u8(), "src1": lambda: img_u8(),
        "src2": lambda: img_u8(), "image": lambda: img_u8(),
        "img": lambda: img_u8(), "img1": lambda: img_u8(),
        "img2": lambda: img_u8(), "frame": lambda: img_u8(),
        "templateImage": lambda: gray_u8(), "inputImage": lambda: img_u8(),
        "probImage": lambda: gray_u8(),
        "mhi": lambda: img_f32(1)[..., 0],
        "silhouette": lambda: mask_u8(),
        "edges": lambda: mask_u8(),
        "mask": lambda: mask_u8(),
        "inpaintMask": lambda: mask_u8(),
        "gray": lambda: gray_u8(),
        "patch": lambda: img_u8(3, 8, 8),
        "templ": lambda: img_u8(3, 8, 8),
        "template": lambda: gray_u8(8, 8),
        "dst": lambda: img_u8(),
        "arr": lambda: img_u8(), "a": lambda: img_u8(),
        "b": lambda: img_u8(), "array": lambda: img_u8(),
        "m1": lambda: img_u8(), "m2": lambda: img_u8(),
        "data": lambda: img_f32(0).astype(np.float32),
        "samples": lambda: _rng().rand(20, 3).astype(np.float32),
        # geometry / points
        "points": lambda: pts2f(),
        "pts": lambda: pts2f(),
        "curve": lambda: contour(),
        "contour": lambda: contour(),
        "points1": lambda: pts2f(), "points2": lambda: pts2f(),
        "imagePoints": lambda: pts2f(),
        "imagePoints1": lambda: pts2f(), "imagePoints2": lambda: pts2f(),
        "objectPoints": lambda: pts3f(),
        "prevPts": lambda: pts2f(8), "nextPts": lambda: pts2f(8),
        "corners": lambda: pts2f(8),
        "vertices": lambda: contour().reshape(-1, 2).astype(np.float32),
        "center": lambda: (W // 2, H // 2),
        "pt1": lambda: (4, 5), "pt2": lambda: (30, 25),
        "pt": lambda: (10, 10), "p": lambda: (W // 2, H // 2),
        "org": lambda: (5, 20),
        "position": lambda: (5, 20),
        "anchor": lambda: (-1, -1),
        "offset": lambda: (0, 0),
        "shift": lambda: 0,
        "rect": lambda: (4, 4, 16, 12),
        "roi": lambda: (4, 4, 16, 12),
        "window": lambda: (4, 4, 16, 12),
        "box": lambda: ((16.0, 12.0), (10.0, 8.0), 15.0),
        "rect1": lambda: (2, 2, 10, 10), "rect2": lambda: (6, 6, 10, 10),
        # matrices
        "M": lambda: np.array([[1.0, 0, 2], [0, 1.0, 3]]),
        "m": lambda: np.array([[1.0, 0, 2], [0, 1.0, 3]]),
        "H": lambda: np.eye(3),
        "K": lambda: camK(),
        "R": lambda: np.eye(3),
        "Q": lambda: np.eye(4),
        "T": lambda: np.array([1.0, 0.0, 0.0]),
        "E": lambda: _e_mat(),
        "F": lambda: _e_mat(),
        "rvec": lambda: np.array([0.01, 0.02, 0.03]),
        "tvec": lambda: np.array([0.1, 0.2, 1.0]),
        "rvec1": lambda: np.array([0.01, 0.02, 0.03]),
        "tvec1": lambda: np.array([0.1, 0.2, 1.0]),
        "rvec2": lambda: np.array([0.02, 0.01, 0.04]),
        "tvec2": lambda: np.array([0.2, 0.1, 1.1]),
        "rvecs": lambda: [np.array([0.01, 0.02, 0.03])],
        "tvecs": lambda: [np.array([0.1, 0.2, 1.0])],
        "cameraMatrix": lambda: camK(),
        "cameraMatrix1": lambda: camK(), "cameraMatrix2": lambda: camK(),
        "newCameraMatrix": lambda: camK(),
        "distCoeffs": lambda: dist5(),
        "distCoeffs1": lambda: dist5(), "distCoeffs2": lambda: dist5(),
        "projMatr1": lambda: camK() @ np.eye(3, 4),
        "projMatr2": lambda: camK() @ np.hstack(
            [np.eye(3), [[0.1], [0], [0]]]),
        "projPoints1": lambda: pts2f().reshape(-1, 2).T.astype(np.float64),
        "projPoints2": lambda: pts2f().reshape(-1, 2).T.astype(np.float64),
        "kernel": lambda: np.ones((3, 3), np.uint8),
        "kernelX": lambda: np.array([1.0, 2, 1]) / 4,
        "kernelY": lambda: np.array([1.0, 2, 1]) / 4,
        "lut": lambda: np.arange(256, dtype=np.uint8),
        "mean": lambda: np.zeros(3),
        "eigenvectors": lambda: np.eye(3),
        "window_fn": lambda: None,
        # scalars
        "ksize": lambda: 3, "d": lambda: 3,
        "blockSize": lambda: 2, "apertureSize": lambda: 3,
        "aperture_size": lambda: 3,
        "ddepth": lambda: -1, "dtype": lambda: -1, "depth": lambda: 0,
        "dx": lambda: 1, "dy": lambda: 0,
        "x": lambda: 1.0, "y": lambda: 1.0,
        "n": lambda: 4,
        "thresh": lambda: 128.0, "maxval": lambda: 255.0,
        "threshold": lambda: 50.0,
        "threshold1": lambda: 50.0, "threshold2": lambda: 150.0,
        "alpha": lambda: 0.5, "beta": lambda: 0.5, "gamma": lambda: 0.0,
        "angle": lambda: 30.0, "scale": lambda: 1.0,
        "delta": lambda: 0.0,
        "rho": lambda: 1.0, "theta": lambda: np.pi / 180,
        "sigma": lambda: 1.5,
        "sigmaX": lambda: 1.5, "sigmaY": lambda: 0.0,
        "sigmaColor": lambda: 25.0, "sigmaSpace": lambda: 5.0,
        "sigma_s": lambda: 10.0, "sigma_r": lambda: 0.15,
        "sp": lambda: 5.0, "sr": lambda: 20.0,
        "h": lambda: 3.0,
        "hColor": lambda: 3.0,
        "radius": lambda: 5, "maxRadius": lambda: 10.0,
        "minRadius": lambda: 0,
        "thickness": lambda: 1, "lineType": lambda: 8,
        "line_type": lambda: 8,
        "fontFace": lambda: 0, "fontScale": lambda: 0.5,
        "fontHeight": lambda: 10,
        "pixelSize": lambda: 1,
        "color": lambda: (0, 255, 0),
        "text": lambda: "ok",
        "flags": lambda: 0, "method": lambda: 0, "mode": lambda: 0,
        "op": lambda: 0, "rotateCode": lambda: 0, "code": lambda: 0,
        "flipCode": lambda: 0,
        "borderType": lambda: 4, "borderMode": lambda: 4,
        "border_type": lambda: 4,
        "borderValue": lambda: 0,
        "normType": lambda: 4, "norm_type": lambda: 4,
        "interpolation": lambda: 1,
        "distanceType": lambda: 2, "maskSize": lambda: 3,
        "dsize": lambda: (W // 2, H // 2),
        "size": lambda: (W, H),
        "imageSize": lambda: (W, H),
        "patternSize": lambda: (4, 3),
        "winSize": lambda: (5, 5),
        "zeroZone": lambda: (-1, -1),
        "blockStride": lambda: (8, 8),
        "cellSize": lambda: (8, 8),
        "criteria": lambda: term_criteria(),
        "termCriteria": lambda: term_criteria(),
        "maxCount": lambda: 5, "maxIters": lambda: 20,
        "iterations": lambda: 1, "maxLevel": lambda: 2,
        "niters": lambda: 3,
        "K": lambda: camK(),
        "k": lambda: 0.04,
        "fx": lambda: 0.5, "fy": lambda: 0.5,
        "m00": lambda: 1.0,
        "qualityLevel": lambda: 0.01, "minDistance": lambda: 5.0,
        "maxCorners": lambda: 10,
        "maxArea": lambda: 100.0, "minArea": lambda: 1.0,
        "winStride": lambda: (8, 8), "padding": lambda: (0, 0),
        "histSize": lambda: [16], "ranges": lambda: [0, 256],
        "channels": lambda: [0],
        "channel": lambda: 0,
        "images": lambda: [img_u8()],
        "hist": lambda: np.ones((16, 1), np.float32),
        "signature1": lambda: np.array(
            [[1.0, 0, 0], [1.0, 5, 5]], np.float32),
        "signature2": lambda: np.array(
            [[1.0, 1, 1], [1.0, 4, 4]], np.float32),
        "H1": lambda: np.ones((16,), np.float32),
        "H2": lambda: np.ones((16,), np.float32),
        "lowerb": lambda: (10, 10, 10), "upperb": lambda: (200, 200, 200),
        "markers": lambda: np.zeros((H, W), np.int32),
        "bestLabels": lambda: None,
        "labels": lambda: None,
        "attempts": lambda: 1,
        "centers": lambda: None,
        "distance": lambda: 10.0,
        "fs": lambda: None,
        "buf": lambda: np.zeros(16, np.uint8),
        "ext": lambda: ".png",
        "winname": lambda: "callcov", "windowName": lambda: "callcov",
        "window_name": lambda: "callcov",
        "trackbarName": lambda: "tb", "trackbarname": lambda: "tb",
        "prop_id": lambda: 0, "propId": lambda: 0,
        "delay": lambda: 1,
        "value": lambda: 1.0, "val": lambda: 1.0,
        "count": lambda: 2,
        "times": lambda: np.array([0.01, 0.04, 0.1], np.float32),
        "exposure_times": lambda: np.array([0.01, 0.04, 0.1], np.float32),
        "response": lambda: None,
        "dist": lambda: 10.0,
        "maxDist": lambda: 10.0,
        "stdDev": lambda: None,
        "seed": lambda: 1,
        "low": lambda: 0.0, "high": lambda: 1.0,
        "idx": lambda: 0, "index": lambda: 0,
        "cn": lambda: 3,
        "rows": lambda: H, "cols": lambda: W,
        "nimages": lambda: 1,
        "distType": lambda: 2, "param": lambda: 0.0,
        "reps": lambda: 0.01, "aeps": lambda: 0.01,
        "coi": lambda: 0,
        "order": lambda: 2,
        "onChange": lambda: (lambda *_: None),
        "userdata": lambda: None,
        "pos": lambda: 0,
        "key": lambda: "k",
        "obj": lambda: 0,
        "name": lambda: "k",
        "node": lambda: None,
        "fn": lambda: (lambda *_: None),
        "state": lambda: 0,
    }
    return table.get(n)


def _e_mat():
    # a valid essential matrix from (R=I rotated slightly, t)
    t = np.array([0.1, 0.2, 1.0])
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    import numpy.linalg as la  # noqa
    th = 0.05
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    return tx @ Rz


_MISS = object()


_WRITE_EXT = {
    "savepointcloud": ".ply", "savemesh": ".ply", "imwrite": ".png",
    "imwritemulti": ".png", "writeopticalflow": ".flo",
}


def _filename_for(func_name: str) -> str:
    """Write-style callables get a writable tmp path with the right
    extension; read-style ones get a MISSING path (FileNotFoundError
    proves the wrapper reached its real implementation — the bug class
    hunted here is TypeError/AttributeError/NotImplementedError).
    Never reuse one path for both: r4's sweep hang came from imwrite
    creating the file a later PLY loader then parsed forever."""
    base = func_name.rsplit(".", 1)[-1].lower()
    for key, ext in _WRITE_EXT.items():
        if base.startswith(key):
            return f"/tmp/rcv_callcov_out{ext}"
    if base.startswith(("save", "write", "imwrite", "dump", "imencode")):
        return "/tmp/rcv_callcov_out.bin"
    return "/tmp/rcv_callcov_missing.nope"


def synth_arg(pname: str, func_name: str):
    if pname in ("filename", "filename_or_buf", "file", "path",
                 "fileName"):
        return _filename_for(func_name)
    f = _by_name(pname)
    if f is not None:
        return f()
    # suffix/substring heuristics
    ln = pname.lower()
    if ln.endswith(("img", "image", "frame")):
        return img_u8()
    if "mask" in ln:
        return mask_u8()
    if ln.endswith(("x", "y")) and len(pname) <= 3:
        return 1
    if "size" in ln:
        return 3
    if "thresh" in ln:
        return 50.0
    if "flag" in ln or "type" in ln or "method" in ln or "mode" in ln:
        return 0
    if "scale" in ln or "factor" in ln:
        return 1.0
    if "iter" in ln or "count" in ln or "level" in ln:
        return 2
    if "name" in ln or "win" in ln:
        return "callcov"
    return _MISS


def build_call(func, qualname: str, overrides: dict):
    """Return (args, kwargs) for func, or a string reason to skip."""
    if qualname in overrides:
        ov = overrides[qualname]
        if isinstance(ov, str):
            return ov          # skip reason
        return ov() if callable(ov) else ov
    try:
        sig = inspect.signature(func)
    except (TypeError, ValueError):
        return "no-signature"
    args = []
    for p in sig.parameters.values():
        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            continue
        if p.default is not inspect.Parameter.empty:
            continue           # rely on defaults
        if p.name in ("self",):
            continue
        v = synth_arg(p.name, qualname)
        if v is _MISS:
            return f"unsynthesized-param:{p.name}"
        args.append(v)
    return (tuple(args), {})

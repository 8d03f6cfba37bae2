"""cv2.utils role: debugging/logging helpers."""
import numpy as np

from . import logging  # noqa: F401


def dumpInputArray(a):
    a = np.asarray(a)
    return (f"InputArray: size(-1x-1) kind=MAT flags=0 total={a.size} "
            f"dims={a.ndim} size={a.shape}")


def dumpBool(v):
    return f"Bool: {bool(v)}"


def dumpInt(v):
    return f"Int: {int(v)}"


def dumpFloat(v):
    return f"Float: {float(v):.2f}"


def dumpDouble(v):
    return f"Double: {float(v):.2f}"


def dumpCString(s):
    return f"String: {s}"

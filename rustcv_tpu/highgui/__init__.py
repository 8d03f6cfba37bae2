"""highgui — window display + key events (headless-capable).

Reference: ``rustcv/src/highgui/mod.rs:12-141`` — a global window manager
(name → window), ``imshow`` recreating the window on size change,
``wait_key`` mapping Esc/Space/Enter/Q → 27/32/13/113, BGR→0x00RRGGBB
packing for the framebuffer.

TPU hosts are headless, so the "window" is a sink abstraction:
- default: an in-memory framebuffer (inspectable via :func:`get_window_frame`
  — what a test or notebook polls instead of a screen);
- ``RUSTCV_TPU_DISPLAY_DIR=/path``: additionally writes ``{name}.png`` per
  imshow (atomic replace), so any file watcher becomes the display;
- key events come from :func:`push_key` (tests/automation) — ``wait_key``
  sleeps the requested delay and pops the injected queue, returning -1 when
  empty, exactly like the reference with no key down.
"""

from __future__ import annotations

import os
import threading
import time
from collections import deque
from typing import Deque, Dict, Optional, Tuple

import numpy as np

from ..core.mat import Mat

# Key mapping (highgui/mod.rs:85-112)
KEY_ESC = 27
KEY_SPACE = 32
KEY_ENTER = 13
KEY_Q = 113

_lock = threading.Lock()
_windows: Dict[str, np.ndarray] = {}
_key_queue: Deque[int] = deque()


def mat_to_u32_buffer(mat: Mat) -> np.ndarray:
    """BGR bytes → 0x00RRGGBB u32 framebuffer (mod.rs:125-141)."""
    a = mat.to_numpy().astype(np.uint32)
    b, g, r = a[..., 0], a[..., 1], a[..., 2]
    return (r << 16) | (g << 8) | b


def imshow(winname: str, mat: Mat) -> None:
    """Present a frame. Size changes just replace the buffer (the reference
    recreates the OS window, mod.rs:36-70 — here the sink is elastic)."""
    frame = mat.to_numpy()
    with _lock:
        _windows[winname] = frame
    out_dir = os.environ.get("RUSTCV_TPU_DISPLAY_DIR")
    if out_dir:
        from PIL import Image

        os.makedirs(out_dir, exist_ok=True)
        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in winname)
        tmp = os.path.join(out_dir, f".{safe}.tmp.png")
        Image.fromarray(frame[..., ::-1]).save(tmp)
        os.replace(tmp, os.path.join(out_dir, f"{safe}.png"))


def get_window_frame(winname: str) -> Optional[np.ndarray]:
    with _lock:
        f = _windows.get(winname)
        return None if f is None else f.copy()


def window_names() -> Tuple[str, ...]:
    with _lock:
        return tuple(_windows.keys())


def push_key(key: int) -> None:
    """Inject a key event (the headless stand-in for a real keyboard)."""
    with _lock:
        _key_queue.append(key)


def wait_key(delay_ms: int = 0) -> int:
    """Sleep ``delay_ms`` then return the next injected key, or -1."""
    if delay_ms > 0:
        time.sleep(delay_ms / 1000.0)
    with _lock:
        if _key_queue:
            return _key_queue.popleft()
    return -1


def destroy_window(winname: str) -> None:
    with _lock:
        _windows.pop(winname, None)


def destroy_all_windows() -> None:
    with _lock:
        _windows.clear()


__all__ = [
    "KEY_ENTER", "KEY_ESC", "KEY_Q", "KEY_SPACE", "destroy_all_windows",
    "destroy_window", "get_window_frame", "imshow", "mat_to_u32_buffer",
    "push_key", "wait_key", "window_names",
]

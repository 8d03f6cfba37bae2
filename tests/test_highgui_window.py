"""Opt-in real-window backend (SDL/pygame) driven headlessly via SDL's
dummy video driver — the real code path (surface creation, size-change
recreation, keyboard event mapping) without an X server."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = r"""
import os
os.environ["RUSTCV_GUI"] = "dummy"
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from rustcv_tpu.core.mat import Mat
from rustcv_tpu import highgui

m = Mat.from_array(np.full((48, 64, 3), 200, np.uint8))
highgui.imshow("win", m)
gui = highgui._get_gui()
assert gui is not None and gui.size == (64, 48), gui and gui.size
# window content round-trip through the SDL surface
import pygame
px = pygame.surfarray.array3d(gui.screen)  # (w, h, 3) RGB
assert px.shape == (64, 48, 3) and (px == 200).all(), px.shape

# size change recreates the window (reference mod.rs:36-70)
m2 = Mat.from_array(np.zeros((96, 128, 3), np.uint8))
highgui.imshow("win", m2)
assert gui.size == (128, 96)

# real key event -> reference key map
pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_SPACE))
assert highgui.wait_key(50) == highgui.KEY_SPACE
pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_ESCAPE))
assert highgui.wait_key(50) == highgui.KEY_ESC
# unmapped key ignored (reference maps only Esc/Space/Enter/Q)
pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=pygame.K_a))
assert highgui.wait_key(20) == -1
# injected keys still take precedence
highgui.push_key(99)
assert highgui.wait_key(0) == 99
highgui.destroy_all_windows()
print("GUI_OK")
"""


def test_sdl_dummy_window_end_to_end():
    pytest.importorskip("pygame")
    res = subprocess.run(
        [sys.executable, "-c", CODE], cwd=REPO, capture_output=True, text=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "GUI_OK" in res.stdout


def test_headless_sink_unchanged():
    """With the GUI forced off (conftest sets RUSTCV_GUI=0) the sink path is
    untouched regardless of DISPLAY."""
    from rustcv_tpu import highgui
    from rustcv_tpu.core.mat import Mat

    assert not highgui._gui_wanted()
    m = Mat.from_array(np.ones((8, 8, 3), np.uint8))
    highgui.imshow("sink", m)
    assert highgui.get_window_frame("sink").shape == (8, 8, 3)
    highgui.destroy_all_windows()

"""Host-side text rasterization for put_text.

The reference rasterizes glyphs with rusttype from an embedded TTF and
alpha-blends per pixel (``rustcv/src/imgproc/drawing.rs:108-163``, scale =
``font_scale * 20.0``, ``org`` is the text baseline origin; the font ships
inside the binary via ``include_bytes!`` at ``drawing.rs:115``). We match
that discipline: a VENDORED DejaVuSans.ttf (``rustcv_tpu/assets/``, with its
Bitstream Vera license) is the only font ever used, so put_text output is
identical on every host — no environment-dependent fallback chain. Glyphs
rasterize on the host **once per (text, scale)** with PIL/FreeType into a u8
coverage mask, then blend on device
(:func:`rustcv_tpu.ops.draw.blend_mask_at`) or on host
(:func:`rustcv_tpu.ops.golden.blend_mask`).

Masks are padded to bucketed canvas sizes so changing strings (FPS counters)
never trigger device recompilation.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Tuple

import numpy as np

_VENDORED_FONT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "DejaVuSans.ttf",
)

# Canvas width buckets (heights derive from font size); powers-of-two-ish so
# a handful of compiled blend kernels covers all realistic overlay strings.
_WIDTH_BUCKETS = (64, 128, 256, 512, 1024)


@lru_cache(maxsize=8)
def _load_font(px_size: int):
    from PIL import ImageFont

    # Vendored font ONLY: a fallback chain would make the same put_text call
    # produce different pixels on different hosts, breaking the frozen-spec
    # discipline (everything else in ops/golden.py is SHA256-pinned).
    return ImageFont.truetype(_VENDORED_FONT, px_size)


def _bucket(n: int, buckets=_WIDTH_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


@lru_cache(maxsize=256)
def rasterize(text: str, font_scale: float) -> Tuple[np.ndarray, int, int]:
    """Rasterize ``text`` → (mask, dx, dy).

    mask: (canvas_h, canvas_w) u8 coverage, bucketed width; (dx, dy) is the
    offset to add to the baseline origin ``org`` to get the mask's top-left
    placement (matches the reference's baseline convention: glyphs render
    above org.y, descenders below).
    """
    from PIL import Image, ImageDraw

    px_size = max(1, round(font_scale * 20.0))
    font = _load_font(px_size)
    ascent, descent = font.getmetrics()

    # Measure
    probe = Image.new("L", (1, 1))
    d = ImageDraw.Draw(probe)
    bbox = d.textbbox((0, 0), text, font=font)
    tw = max(1, bbox[2] - bbox[0])

    canvas_h = ascent + descent
    canvas_w = _bucket(tw)
    img = Image.new("L", (canvas_w, canvas_h), 0)
    d = ImageDraw.Draw(img)
    d.text((-bbox[0], 0), text, fill=255, font=font)
    mask = np.asarray(img, dtype=np.uint8)

    # org is the baseline start: shift up by the ascent.
    return mask, 0, -ascent


def put_text_host(img_view: np.ndarray, text: str, org_xy: Tuple[int, int], font_scale: float, color_bgr: tuple) -> None:
    """Host-path put_text: rasterize + integer blend, in place."""
    from . import golden

    mask, dx, dy = rasterize(text, font_scale)
    golden.blend_mask(img_view, mask, org_xy[0] + dx, org_xy[1] + dy, color_bgr)


def get_text_size(text: str, font_scale: float
                  ) -> Tuple[Tuple[int, int], int]:
    """OpenCV ``getTextSize`` role for the vendored font:
    ((width, height above baseline), baseline descent) — the box
    ``put_text`` will cover for the same scale."""
    from PIL import Image, ImageDraw

    px_size = max(1, round(font_scale * 20.0))
    font = _load_font(px_size)
    ascent, descent = font.getmetrics()
    probe = Image.new("L", (1, 1))
    d = ImageDraw.Draw(probe)
    bbox = d.textbbox((0, 0), text, font=font)
    return (max(1, bbox[2] - bbox[0]), ascent), descent

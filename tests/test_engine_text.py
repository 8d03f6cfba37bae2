"""Engine-level device text overlay on the packed BGR output."""

import numpy as np

from rustcv_tpu.capture import SimulationDriver, synth_raw
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.ops import golden
from rustcv_tpu.ops.text import rasterize
from rustcv_tpu.runtime import MultiStreamEngine


def test_text_overlay_matches_host_blend(jax_cpu):
    eng = MultiStreamEngine(
        SimulationDriver(paced=False), 2,
        SimpleConfig(width=160, height=120, pixel_format=PixelFormat.YUYV),
        device_sim=True,
    )
    res = eng.tick(block=True, text="FPS 60.0", text_org=(8, 40), text_scale=1.0,
                   text_color=(0, 255, 0))
    got = res.numpy("bgr")
    # host oracle: decode + same rasterized mask + integer blend
    base = golden.yuyv_to_bgr(synth_raw(160, 120, PixelFormat.YUYV, 0), 160, 120)
    mask, dx, dy = rasterize("FPS 60.0", 1.0)
    want = base.copy()
    golden.blend_mask(want, mask, 8 + dx, 40 + dy, (0, 255, 0))
    for i in range(2):
        np.testing.assert_array_equal(got[i], want)
    assert (want != base).any()
    # changing the string re-uses the same blend program (shape bucketed)
    res2 = eng.tick(block=True, text="FPS 59.9")
    assert res2.numpy("bgr").shape == got.shape
    eng.close()


def test_per_stream_text(jax_cpu):
    eng = MultiStreamEngine(
        SimulationDriver(paced=False), 2,
        SimpleConfig(width=160, height=120, pixel_format=PixelFormat.YUYV),
        device_sim=True,
    )
    res = eng.tick(block=True, text=["cam 0", "cam 1"], text_org=(8, 40),
                   text_color=(255, 255, 255))
    got = res.numpy("bgr")
    assert (got[0] != got[1]).any()  # different strings rendered
    base = golden.yuyv_to_bgr(synth_raw(160, 120, PixelFormat.YUYV, 0), 160, 120)
    for i, s in enumerate(["cam 0", "cam 1"]):
        mask, dx, dy = rasterize(s, 1.0)
        want = base.copy()
        golden.blend_mask(want, mask, 8 + dx, 40 + dy, (255, 255, 255))
        np.testing.assert_array_equal(got[i], want, err_msg=f"stream {i}")
    eng.close()

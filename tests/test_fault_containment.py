"""Per-stream fault containment: one failing source degrades that stream,
the batch keeps running."""

import numpy as np

from rustcv_tpu.capture import SimulationDriver
from rustcv_tpu.core import CameraError, PixelFormat, SimpleConfig
from rustcv_tpu.runtime import MultiStreamEngine


class _FlakySource:
    """Wraps a FrameSource; fails every call after `fail_after`."""

    def __init__(self, inner, fail_after: int):
        self._inner = inner
        self._count = 0
        self._fail_after = fail_after

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def next_frame(self):
        self._count += 1
        if self._count > self._fail_after:
            raise CameraError("synthetic device failure")
        return self._inner.next_frame()


def test_one_stream_fails_batch_survives(jax_cpu):
    eng = MultiStreamEngine(
        SimulationDriver(paced=False), 4,
        SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
    )
    # Sabotage stream 2 after its first frame.
    eng._sources[2] = _FlakySource(eng._sources[2], fail_after=1)

    r1 = eng.tick(block=True)
    assert list(r1.sequences) == [0, 0, 0, 0]
    r2 = eng.tick(block=True)
    # stream 2 failed: seq marked -1, error counted, other streams advanced
    assert r2.sequences[2] == -1
    assert [r2.sequences[i] for i in (0, 1, 3)] == [1, 1, 1]
    assert eng.stream_errors[2] == 1
    assert eng.stream_errors[[0, 1, 3]].sum() == 0
    # stream 2's staging row reuses its last good frame (tick-1 content)
    from rustcv_tpu.capture import synth_raw
    from rustcv_tpu.ops import golden

    stale = golden.yuyv_to_bgr(synth_raw(64, 48, PixelFormat.YUYV, 0), 64, 48)
    np.testing.assert_array_equal(r2.numpy("bgr")[2], stale)
    fresh = golden.yuyv_to_bgr(synth_raw(64, 48, PixelFormat.YUYV, 1), 64, 48)
    np.testing.assert_array_equal(r2.numpy("bgr")[0], fresh)
    eng.close()

"""Batched hybrid MJPEG engine path: coefficient staging + device
reconstruction, vs the NumPy oracle and the host-PIL engine path."""

import numpy as np
import pytest

from rustcv_tpu import native
from rustcv_tpu.capture import SimulationDriver, simulation as sim
from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.runtime import MultiStreamEngine

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.build_error()}"
)


class TestHybridEngine:
    def test_matches_oracle(self, jax_cpu):
        from rustcv_tpu.ops.jpeg_tpu import decode_jpeg_numpy

        eng = MultiStreamEngine(
            SimulationDriver(device_count=4, paced=False), 4,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
            mjpeg_backend="hybrid",
        )
        res = eng.tick(block=True)
        got = res.numpy("bgr")
        want = decode_jpeg_numpy(sim.synth_raw(64, 48, PixelFormat.MJPEG, 0)).astype(int)
        for i in range(4):
            assert np.abs(got[i].astype(int) - want).max() <= 1
        eng.close()

    def test_close_to_host_path(self, jax_cpu):
        """Hybrid (float IDCT) vs host PIL (libjpeg islow) within tolerance."""
        kw = dict(
            driver=None, n_streams=2,
            config=SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
        )
        host = MultiStreamEngine(SimulationDriver(device_count=2, paced=False), 2, kw["config"])
        hyb = MultiStreamEngine(
            SimulationDriver(device_count=2, paced=False), 2, kw["config"],
            mjpeg_backend="hybrid",
        )
        a = host.tick(block=True).numpy("bgr").astype(int)
        b = hyb.tick(block=True).numpy("bgr").astype(int)
        host.close()
        hyb.close()
        diff = np.abs(a - b)
        assert diff.mean() < 1.0 and np.percentile(diff, 99) <= 2

    def test_with_resize_and_filter(self, jax_cpu):
        eng = MultiStreamEngine(
            SimulationDriver(device_count=2, paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
            mjpeg_backend="hybrid", resize_to=(32, 24), filter="sobel_mag",
        )
        res = eng.tick(block=True)
        assert res.numpy("bgr").shape == (2, 24, 32, 3)
        assert res.outputs["filtered"].shape == (2, 24, 32)
        eng.close()

    def test_rejects_bad_backend(self):
        with pytest.raises(ValueError):
            MultiStreamEngine(
                SimulationDriver(device_count=1, paced=False), 1,
                SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
                mjpeg_backend="nope",
            )

    def test_hybrid_set_resolution(self, jax_cpu):
        eng = MultiStreamEngine(
            SimulationDriver(device_count=2, paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
            mjpeg_backend="hybrid",
        )
        assert eng.tick(block=True).numpy("bgr").shape == (2, 48, 64, 3)
        eng.set_resolution(160, 120)
        assert eng.tick(block=True).numpy("bgr").shape == (2, 120, 160, 3)
        eng.close()

"""Device-side simulation source: bit-exact parity with the host generators,
and engine integration (the zero-H2D capture path used by the headline
bench)."""

import numpy as np
import pytest

from rustcv_tpu.core import PixelFormat, SimpleConfig
from rustcv_tpu.capture import SimulationDriver, simulation as sim
from rustcv_tpu.ops import golden


class TestSynthParity:
    @pytest.mark.parametrize("w,h", [(64, 48), (160, 120), (130, 54)])
    @pytest.mark.parametrize("seq", [0, 1, 17, 999])
    def test_bgr_pattern(self, jax_cpu, w, h, seq):
        from rustcv_tpu.ops import synth as dsynth

        want = sim.synth_bgr(w, h, seq)
        got = np.asarray(
            dsynth.synth_bgr(jax_cpu.numpy.asarray([seq], jax_cpu.numpy.int32), w, h)
        )[0]
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "fmt",
        [PixelFormat.YUYV, PixelFormat.NV12, PixelFormat.BGRA32,
         PixelFormat.RGB24, PixelFormat.BGR24],
    )
    def test_raw_encoders(self, jax_cpu, fmt):
        from rustcv_tpu.ops import synth as dsynth

        w, h, seqs = 64, 48, [0, 3, 42]
        want = np.stack([sim.synth_raw(w, h, fmt, s) for s in seqs])
        got = np.asarray(
            dsynth.synth_raw(jax_cpu.numpy.asarray(seqs, jax_cpu.numpy.int32), w, h, fmt)
        )
        np.testing.assert_array_equal(got, want)


class TestDeviceSimEngine:
    def test_matches_host_path(self, jax_cpu):
        from rustcv_tpu.runtime import MultiStreamEngine

        cfg = SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV)
        host_eng = MultiStreamEngine(SimulationDriver(paced=False), 4, cfg, filter="blur_sobel")
        dev_eng = MultiStreamEngine(
            SimulationDriver(paced=False), 4, cfg, filter="blur_sobel", device_sim=True
        )
        rh = host_eng.tick(block=True)
        rd = dev_eng.tick(block=True)
        np.testing.assert_array_equal(rh.numpy("bgr"), rd.numpy("bgr"))
        np.testing.assert_array_equal(rh.numpy("filtered"), rd.numpy("filtered"))
        # second tick advances sequences identically
        rh2 = host_eng.tick(block=True)
        rd2 = dev_eng.tick(block=True)
        np.testing.assert_array_equal(rh2.numpy("bgr"), rd2.numpy("bgr"))
        host_eng.close()
        dev_eng.close()

    def test_mjpeg_rejected(self):
        from rustcv_tpu.core import CameraError
        from rustcv_tpu.runtime import MultiStreamEngine

        with pytest.raises(CameraError):
            MultiStreamEngine(
                SimulationDriver(paced=False), 2,
                SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
                device_sim=True,
            )

    def test_mesh_sharded_device_sim(self, jax_cpu):
        if len(jax_cpu.devices()) < 8:
            import pytest

            pytest.skip("needs 8 devices (virtual CPU mesh)")
        from rustcv_tpu.parallel import stream_mesh
        from rustcv_tpu.runtime import MultiStreamEngine

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 8,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            filter="sobel_mag", device_sim=True, mesh=stream_mesh(),
        )
        res = eng.tick(block=True)
        assert len(res.outputs["bgr"].sharding.device_set) == 8
        want = golden.yuyv_to_bgr(sim.synth_raw(64, 48, PixelFormat.YUYV, 0), 64, 48)
        np.testing.assert_array_equal(res.numpy("bgr")[7], want)
        eng.close()

    def test_set_resolution_device_sim(self, jax_cpu):
        from rustcv_tpu.runtime import MultiStreamEngine

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YUYV),
            device_sim=True,
        )
        assert eng.tick(block=True).numpy("bgr").shape == (2, 48, 64, 3)
        eng.set_resolution(160, 120)
        assert eng.tick(block=True).numpy("bgr").shape == (2, 120, 160, 3)
        eng.close()

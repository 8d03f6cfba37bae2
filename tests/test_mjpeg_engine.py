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


def test_native_host_decode_bit_exact_with_pil(jax_cpu):
    """The native libjpeg-turbo pitched decode and the PIL fallback are the
    same library — outputs must be bit-identical, including into a padded
    (step > row_bytes) Mat."""
    from rustcv_tpu import native
    from rustcv_tpu.core.mat import Mat
    from rustcv_tpu.ops import decode as _decode
    from rustcv_tpu.capture.simulation import encode_mjpeg, synth_bgr

    if not native.jpeg_host_available():
        pytest.skip("native libjpeg host decode not built")
    jpg = bytes(encode_mjpeg(synth_bgr(324, 244, 3), quality=88))
    want = _decode.decode_mjpeg_host_rgb(jpg)[..., ::-1]

    mat = Mat.new(244, 324, 3, step=324 * 3 + 128)  # padded stride
    _decode.decode_mjpeg_into_mat(jpg, mat)
    np.testing.assert_array_equal(mat.array, want)
    # padding untouched
    assert (mat.data[:, 324 * 3:] == 0).all()


def test_engine_mjpeg_native_matches_pil_path(jax_cpu):
    """Engine host MJPEG path: native BGR staging (packed passthrough) must
    produce the same frames as the PIL+device-swap path."""
    from rustcv_tpu import native

    if not native.jpeg_host_available():
        pytest.skip("native libjpeg host decode not built")
    cfg = SimpleConfig(width=128, height=96, fps=30, pixel_format=PixelFormat.MJPEG)
    eng_nat = MultiStreamEngine(SimulationDriver(paced=False), 2, cfg)
    assert eng_nat.spec.mjpeg_staged_bgr
    out_nat = eng_nat.tick(block=True).numpy("bgr")
    eng_nat.close()

    eng_pil = MultiStreamEngine(SimulationDriver(paced=False), 2, cfg)
    eng_pil._mjpeg_native = False  # force PIL fallback
    from dataclasses import replace
    from rustcv_tpu.runtime.pipeline import get_pipeline

    eng_pil.spec = replace(eng_pil.spec, mjpeg_staged_bgr=False)
    eng_pil._fn = get_pipeline(eng_pil.spec)
    out_pil = eng_pil.tick(block=True).numpy("bgr")
    eng_pil.close()

    np.testing.assert_array_equal(out_nat, out_pil)


def test_engine_mjpeg_native_filter_gray_parity(jax_cpu):
    """blur_sobel on the BGR24 packed staging (bgr_to_gray_packed_rows) must
    match the interleaved-path result."""
    from rustcv_tpu import native

    if not native.jpeg_host_available():
        pytest.skip("native libjpeg host decode not built")
    cfg = SimpleConfig(width=128, height=96, fps=30, pixel_format=PixelFormat.MJPEG)
    eng = MultiStreamEngine(SimulationDriver(paced=False), 1, cfg, filter="blur_sobel")
    filt_nat = np.asarray(eng.tick(block=True).outputs["filtered"])
    bgr0 = eng.tick(block=True)  # advance, unused
    eng.close()

    from rustcv_tpu.ops import golden
    from rustcv_tpu.ops.decode import decode_mjpeg_host_rgb
    from rustcv_tpu.capture.simulation import SimulationDriver as SD

    # golden: decode frame 0 on host, gray, gaussian5, sobel
    drv = SD(paced=False)
    src, _ = drv.open_simple("sim:0", cfg)
    src.start()
    f = src.next_frame()
    bgr = decode_mjpeg_host_rgb(f.data)[..., ::-1]
    want = golden.blur_sobel_mag_u8(bgr)
    np.testing.assert_array_equal(filt_nat[0], want)
    src.stop()


class TestPackedHybrid:
    def _engine(self, n=2):
        cfg = SimpleConfig(width=128, height=96, fps=30, pixel_format=PixelFormat.MJPEG)
        return MultiStreamEngine(
            SimulationDriver(paced=False), n, cfg, mjpeg_backend="hybrid"
        )

    def test_packed_is_default_and_matches_dense(self, jax_cpu):
        """Ticks after sizing run the packed-input program; its frames must
        equal the dense program's bit-for-bit (scatter-add reproduces the
        dense grids exactly)."""
        eng = self.__class__._engine(self)
        r1 = eng.tick(block=True)
        assert eng.spec.mjpeg_packed and eng.spec.coeff_geometry
        packed_bgr = r1.numpy("bgr")

        # Same frames through the dense program: rebuild engine, force the
        # dense path by setting capacity to 0 on tick 2.
        eng2 = self.__class__._engine(self)
        eng2.tick(block=True)  # sizing + packed tick 0
        eng2._dense_cap = 0  # force busy blocks over capacity → dense fallback
        r2 = eng2.tick(block=True)
        eng3 = self.__class__._engine(self)
        eng3.tick(block=True)
        r3 = eng3.tick(block=True)  # packed tick 1
        np.testing.assert_array_equal(r2.numpy("bgr"), r3.numpy("bgr"))
        assert packed_bgr.shape == r2.numpy("bgr").shape
        eng.close(); eng2.close(); eng3.close()

    def test_fallback_mixed_capacity(self, jax_cpu):
        """One stream over capacity → whole tick runs dense; packed streams'
        rows are host-scattered (np.add.at) and must match exactly."""
        eng = self.__class__._engine(self, n=2)
        eng.tick(block=True)

        # Patch stream 1's packed decode to simulate over-capacity while
        # stream 0 stays packed.
        import rustcv_tpu.native as native

        orig = native.jpeg_entropy_decode_blockpacked
        calls = {"n": 0}

        def flaky(data, k, dense_cap, **kw):
            calls["n"] += 1
            if calls["n"] == 2:  # second stream this tick
                return None
            return orig(data, k, dense_cap, **kw)

        native.jpeg_entropy_decode_blockpacked = flaky
        try:
            r = eng.tick(block=True)
        finally:
            native.jpeg_entropy_decode_blockpacked = orig
        mixed = r.numpy("bgr")

        # Reference: a clean engine at the same tick (all packed).
        eng2 = self.__class__._engine(self, n=2)
        eng2.tick(block=True)
        want = eng2.tick(block=True).numpy("bgr")
        np.testing.assert_array_equal(mixed, want)
        eng.close(); eng2.close()


def test_hybrid_stream_fault_contained(jax_cpu):
    """A failing source (or corrupt JPEG) in hybrid mode degrades ONE stream
    (seq=-1, last packed rows reused) — it must not kill the batched tick
    or leak non-CameraError exceptions (round-2 review finding)."""
    from rustcv_tpu.core import CameraError

    cfg = SimpleConfig(width=128, height=96, fps=30, pixel_format=PixelFormat.MJPEG)
    eng = MultiStreamEngine(
        SimulationDriver(paced=False), 2, cfg, mjpeg_backend="hybrid"
    )
    r1 = eng.tick(block=True)

    src = eng._sources[1]

    class Corrupt:
        def __getattr__(s, k):
            return getattr(src, k)

        def next_frame(s):
            f = src.next_frame()
            d = np.array(f.data)
            d[30:] = 0xFF  # trash the scan → DecodeError inside the gather
            from types import SimpleNamespace

            return SimpleNamespace(sequence=f.sequence, data=d)

    eng._sources[1] = Corrupt()
    r2 = eng.tick(block=True)
    assert r2.sequences[1] == -1 and eng.stream_errors[1] == 1
    # stream 1 reused its last good packed rows → same pixels as tick 1
    np.testing.assert_array_equal(r2.numpy("bgr")[1], r1.numpy("bgr")[1])
    # stream 0 advanced normally
    assert r2.sequences[0] == 1

    class Dead:
        def __getattr__(s, k):
            return getattr(src, k)

        def next_frame(s):
            raise CameraError("device unplugged")

    eng._sources[1] = Dead()
    r3 = eng.tick(block=True)
    assert r3.sequences[1] == -1 and eng.stream_errors[1] == 2
    eng.close()


def test_hybrid_packed_on_mesh(jax_cpu):
    """Block-packed hybrid MJPEG sharded over the stream mesh: the packed
    staging arrays (idx/val/dense rows) ride the same NamedSharding as raw
    staging; frames must match the meshless engine bit-for-bit."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (virtual CPU mesh)")
    from rustcv_tpu.parallel import stream_mesh

    cfg = SimpleConfig(width=128, height=96, fps=30, pixel_format=PixelFormat.MJPEG)
    mesh = stream_mesh()
    eng_m = MultiStreamEngine(
        SimulationDriver(paced=False), 8, cfg, mjpeg_backend="hybrid", mesh=mesh
    )
    r_m = eng_m.tick(block=True)
    assert len(r_m.outputs["bgr"].sharding.device_set) == 8
    eng_m.close()

    eng_s = MultiStreamEngine(
        SimulationDriver(paced=False), 8, cfg, mjpeg_backend="hybrid"
    )
    r_s = eng_s.tick(block=True)
    eng_s.close()
    np.testing.assert_array_equal(r_m.numpy("bgr"), r_s.numpy("bgr"))


def test_hybrid_subsampling_change_contained(jax_cpu):
    """A stream that switches chroma subsampling mid-run (grid mismatch vs
    the sizing frame) must degrade that stream only — pre-fix this was a
    batch-killing AssertionError from the staging-shape assert."""
    import io

    from types import SimpleNamespace

    from PIL import Image

    cfg = SimpleConfig(width=128, height=96, fps=30, pixel_format=PixelFormat.MJPEG)
    eng = MultiStreamEngine(SimulationDriver(paced=False), 2, cfg, mjpeg_backend="hybrid")
    r1 = eng.tick(block=True)
    src = eng._sources[1]

    class SubsamplingSwitch:
        def __getattr__(s, k):
            return getattr(src, k)

        def next_frame(s):
            f = src.next_frame()
            img = Image.open(io.BytesIO(bytes(f.data))).convert("RGB")
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=88, subsampling=1)  # 4:2:2
            return SimpleNamespace(
                sequence=f.sequence, data=np.frombuffer(buf.getvalue(), np.uint8)
            )

    eng._sources[1] = SubsamplingSwitch()
    r2 = eng.tick(block=True)
    assert r2.sequences[1] == -1 and eng.stream_errors[1] == 1
    np.testing.assert_array_equal(r2.numpy("bgr")[1], r1.numpy("bgr")[1])
    assert r2.sequences[0] == 1  # healthy stream advanced
    eng.close()

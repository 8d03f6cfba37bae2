"""Extra format coverage: UYVY simulation round-trip, GRAY8 decode paths."""

import numpy as np
import pytest

from rustcv_tpu.capture import Camera, SimulationDriver, simulation as sim
from rustcv_tpu.core import Frame, Mat, PixelFormat, SimpleConfig, Timestamp
from rustcv_tpu.ops import golden
from rustcv_tpu.ops.decode import decode_frame_host, decode_to_device


def _frame(fmt, data, w=64, h=48):
    return Frame(data, w, h, fmt, 0, Timestamp(0, 0.0))


class TestUyvy:
    def test_roundtrip_close(self):
        bgr = sim.synth_bgr(64, 48, 0)
        raw = sim.synth_raw(64, 48, PixelFormat.UYVY, 0)
        back = golden.uyvy_to_bgr(raw, 64, 48)
        err = np.abs(back.astype(int) - bgr.astype(int))
        assert np.percentile(err, 99) <= 12

    def test_host_device_exact(self, jax_cpu):
        raw = sim.synth_raw(64, 48, PixelFormat.UYVY, 7)
        mat = Mat()
        decode_frame_host(_frame(PixelFormat.UYVY, raw), mat)
        dev = decode_to_device(_frame(PixelFormat.UYVY, raw))
        np.testing.assert_array_equal(np.asarray(dev), mat.to_numpy())


class TestGray8:
    def test_decode_replicates_channels(self, jax_cpu):
        raw = sim.synth_raw(64, 48, PixelFormat.GRAY8, 2)
        mat = Mat()
        decode_frame_host(_frame(PixelFormat.GRAY8, raw), mat)
        out = mat.to_numpy()
        assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
        want = golden.bgr_to_gray(sim.synth_bgr(64, 48, 2))
        np.testing.assert_array_equal(out[..., 0], want)
        dev = decode_to_device(_frame(PixelFormat.GRAY8, raw))
        np.testing.assert_array_equal(np.asarray(dev), out)


class TestNv12Fast:
    def test_packed_and_gray_parity(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        w, h = 64, 48
        raw = rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8)
        want = golden.nv12_to_bgr(raw, w, h)
        got = np.asarray(color.nv12_to_bgr(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(got, want)
        packed = np.asarray(color.nv12_to_bgr_packed(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(packed.reshape(h, w, 3), want)
        gray = np.asarray(color.nv12_to_gray(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(gray, golden.bgr_to_gray(want))

    def test_nv12_engine_pipeline(self, jax_cpu):
        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.runtime import MultiStreamEngine
        from rustcv_tpu.core import SimpleConfig

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.NV12),
            filter="blur_sobel", overlay=True, device_sim=True,
        )
        res = eng.tick(block=True)
        base = golden.nv12_to_bgr(sim.synth_raw(64, 48, PixelFormat.NV12, 0), 64, 48)
        np.testing.assert_array_equal(res.numpy("bgr")[0], base)
        want_mag = golden.blur_sobel_mag_u8(base)
        np.testing.assert_array_equal(np.asarray(res.outputs["filtered"])[0], want_mag)
        eng.close()


class TestBgraFast:
    def test_packed_parity(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        w, h = 64, 48
        raw = rng.integers(0, 256, h * w * 4, dtype=np.uint8)
        want = golden.bgra_to_bgr(raw, w, h)
        got = np.asarray(color.bgra_to_bgr(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(got, want)
        packed = np.asarray(color.bgra_to_bgr_packed(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(packed.reshape(h, w, 3), want)

    def test_non_mult4_width_fallback(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        w, h = 30, 8
        raw = rng.integers(0, 256, h * w * 4, dtype=np.uint8)
        want = golden.bgra_to_bgr(raw, w, h)
        got = np.asarray(color.bgra_to_bgr(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(got, want)

    def test_bgra_engine_pipeline(self, jax_cpu):
        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.runtime import MultiStreamEngine
        from rustcv_tpu.core import SimpleConfig

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.BGRA32),
            overlay=True, device_sim=True,
        )
        res = eng.tick(block=True)
        want = golden.bgra_to_bgr(sim.synth_raw(64, 48, PixelFormat.BGRA32, 0), 64, 48)
        np.testing.assert_array_equal(res.numpy("bgr")[0], want)
        eng.close()


class TestRgbFast:
    def test_packed_parity(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        w, h = 64, 48
        raw = rng.integers(0, 256, h * w * 3, dtype=np.uint8)
        want = golden.rgb_to_bgr(raw, w, h)
        got = np.asarray(color.rgb_to_bgr(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(got, want)
        packed = np.asarray(color.rgb_to_bgr_packed(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(packed.reshape(h, w, 3), want)
        gray = np.asarray(color.rgb_to_gray_packed_rows(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(gray, golden.bgr_to_gray(want))

    def test_mjpeg_engine_filter_still_exact(self, jax_cpu):
        """MJPEG host path stages RGB; the packed conversion + direct gray
        must keep the filter output bit-exact vs the oracle chain."""
        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.core import SimpleConfig
        from rustcv_tpu.ops.decode import decode_mjpeg_host_rgb
        from rustcv_tpu.runtime import MultiStreamEngine

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=PixelFormat.MJPEG),
            filter="blur_sobel", overlay=True, device_sim=False,
        )
        res = eng.tick(block=True)
        rgb = decode_mjpeg_host_rgb(sim.synth_raw(64, 48, PixelFormat.MJPEG, 0))
        base = rgb[..., ::-1]
        np.testing.assert_array_equal(res.numpy("bgr")[0], base)
        np.testing.assert_array_equal(
            np.asarray(res.outputs["filtered"])[0], golden.blur_sobel_mag_u8(base)
        )
        eng.close()


class TestYv12:
    def test_host_device_parity(self, rng, jax_cpu):
        from rustcv_tpu.ops import color

        w, h = 64, 48
        raw = rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8)
        want = golden.yv12_to_bgr(raw, w, h)
        got = np.asarray(color.yv12_to_bgr(jax_cpu.numpy.asarray(raw), w, h))
        np.testing.assert_array_equal(got, want)

    def test_sim_roundtrip_close(self):
        bgr = sim.synth_bgr(64, 48, 0)
        raw = sim.synth_raw(64, 48, PixelFormat.YV12, 0)
        back = golden.yv12_to_bgr(raw, 64, 48)
        err = np.abs(back.astype(int) - bgr.astype(int))
        assert np.percentile(err, 95) <= 16  # 4:2:0 nearest-chroma bound

    def test_capture_end_to_end(self, jax_cpu):
        from rustcv_tpu.capture import Camera, SimulationDriver, ModeDescriptor
        from rustcv_tpu.core import SimpleConfig

        modes = [ModeDescriptor(PixelFormat.YV12, 64, 48, (30,))]
        cam = Camera.open_with(
            "sim:0", SimpleConfig(width=64, height=48, pixel_format=PixelFormat.YV12),
            SimulationDriver(modes=modes, paced=False),
        )
        mat = Mat()
        cam.read_decoded(mat)
        want = golden.yv12_to_bgr(sim.synth_raw(64, 48, PixelFormat.YV12, 0), 64, 48)
        np.testing.assert_array_equal(mat.to_numpy(), want)
        cam.close()


class TestPairwisePackedFormats:
    """UYVY and YV12 now take the packed-rows pair decode in the pipeline;
    engine output must stay bit-exact vs golden, incl. the direct-gray
    filter path."""

    @pytest.mark.parametrize("fmt,gold", [
        (PixelFormat.UYVY, golden.uyvy_to_bgr),
        (PixelFormat.YV12, golden.yv12_to_bgr),
    ])
    def test_engine_packed_parity(self, jax_cpu, fmt, gold):
        from rustcv_tpu.capture import SimulationDriver, synth_raw
        from rustcv_tpu.runtime import MultiStreamEngine

        eng = MultiStreamEngine(
            SimulationDriver(paced=False), 2,
            SimpleConfig(width=64, height=48, pixel_format=fmt),
            filter="blur_sobel", overlay=True,
        )
        rects = np.tile(np.array([[4, 4, 20, 16]], np.int32), (2, 1))
        cols = np.tile(np.array([[9, 99, 199]], np.uint8), (2, 1))
        r = eng.tick(rects=rects, rect_colors=cols, block=True)
        for i in range(2):
            raw = synth_raw(64, 48, fmt, 0)
            want = gold(raw, 64, 48)
            ov = want.copy()
            golden.rectangle(ov.reshape(48, -1), 48, 64, 64 * 3, (4, 4, 20, 16), (9, 99, 199), 2)
            np.testing.assert_array_equal(r.numpy("bgr")[i], ov, err_msg=f"{fmt} bgr {i}")
            want_f = golden.blur_sobel_mag_u8(want)
            np.testing.assert_array_equal(
                np.asarray(r.outputs["filtered"])[i], want_f, err_msg=f"{fmt} filt {i}"
            )
        eng.close()


class TestMultiPage:
    """imreadmulti / imwritemulti / imcount (PIL multi-page backend)."""

    def test_tiff_round_trip(self, tmp_path, rng):
        from rustcv_tpu import imgcodecs
        from rustcv_tpu.core.mat import Mat

        frames = [rng.integers(0, 256, (24, 32, 3), np.uint8)
                  for _ in range(4)]
        path = str(tmp_path / "m.tiff")
        assert imgcodecs.imwritemulti(path,
                                      [Mat.from_array(f) for f in frames])
        assert imgcodecs.imcount(path) == 4
        back = imgcodecs.imreadmulti(path)
        assert len(back) == 4
        for f, m in zip(frames, back):
            np.testing.assert_array_equal(m.to_numpy(), f)

    def test_cv2_reads_ours(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        from rustcv_tpu import imgcodecs
        from rustcv_tpu.core.mat import Mat

        frames = [rng.integers(0, 256, (16, 20, 3), np.uint8)
                  for _ in range(3)]
        path = str(tmp_path / "x.tiff")
        imgcodecs.imwritemulti(path, [Mat.from_array(f) for f in frames])
        ok, pages = cv2.imreadmulti(path)
        assert ok and len(pages) == 3
        for f, p in zip(frames, pages):
            np.testing.assert_array_equal(p, f)


def test_metadata_round_trip(tmp_path, rng):
    from rustcv_tpu import imgcodecs
    from rustcv_tpu.core.mat import Mat

    frame = rng.integers(0, 256, (16, 20, 3), np.uint8)
    path = str(tmp_path / "m.png")
    assert imgcodecs.imwrite_with_metadata(
        path, Mat.from_array(frame),
        {"camera": "sim0", "exposure_us": "1250"})
    mat, meta = imgcodecs.imread_with_metadata(path)
    np.testing.assert_array_equal(mat.to_numpy(), frame)
    assert meta.get("camera") == "sim0"
    assert meta.get("exposure_us") == "1250"

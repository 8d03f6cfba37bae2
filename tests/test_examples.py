"""Smoke-run every example headless on the CPU mesh (examples are part of
the public surface — the reference ships six; ours must actually run)."""

import threading

import pytest


class TestExamples:
    def test_camera_demo(self):
        from examples.camera_demo import main

        main(frames=5, paced=False)

    def test_zero_copy_demo(self, capsys):
        from examples.zero_copy_demo import main

        main(n_frames=10, native=True)
        assert "fps" in capsys.readouterr().out

    def test_resolution_bench(self, capsys):
        from examples.resolution_bench import main

        main(seconds=0.1, fps=120)
        out = capsys.readouterr().out
        assert "640x480" in out and "1920x1080" in out

    def test_multi_stream_pipeline(self, capsys):
        from examples.multi_stream_pipeline import main

        main(n_streams=2, width=64, height=48, ticks=4)
        assert "aggregate" in capsys.readouterr().out

    def test_web_streaming_serves_mjpeg(self):
        import http.client
        import time

        from examples import web_streaming as ws

        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.core import PixelFormat, SimpleConfig
        from rustcv_tpu.runtime import MultiStreamEngine

        engine = MultiStreamEngine(
            SimulationDriver(device_count=2, paced=False), 2,
            SimpleConfig(width=64, height=48, fps=30, pixel_format=PixelFormat.YUYV),
            device_sim=True,
        )
        channels = [ws.Broadcast() for _ in range(2)]
        stop = threading.Event()
        t = threading.Thread(
            target=ws.capture_loop, args=(engine, channels, stop, 80), daemon=True
        )
        t.start()
        from http.server import ThreadingHTTPServer

        server = ThreadingHTTPServer(("127.0.0.1", 0), ws.make_handler(channels))
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("GET", "/stream/1")
            resp = conn.getresponse()
            assert resp.status == 200
            assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
            chunk = resp.read(2000)
            assert b"--frame" in chunk and b"image/jpeg" in chunk
            conn.close()
        finally:
            stop.set()
            server.shutdown()
            engine.close()

    def test_web_streaming_tpu_encoder(self):
        """The --encoder tpu path: device FDCT coefficients → host Huffman,
        published frames must be valid JPEG."""
        import io
        import time

        from PIL import Image

        from examples import web_streaming as ws

        from rustcv_tpu.capture import SimulationDriver
        from rustcv_tpu.core import PixelFormat, SimpleConfig
        from rustcv_tpu.runtime import MultiStreamEngine

        pytest.importorskip("rustcv_tpu.native")
        from rustcv_tpu import native

        if not native.available():
            pytest.skip("native lib unavailable")
        engine = MultiStreamEngine(
            SimulationDriver(device_count=2, paced=False), 2,
            SimpleConfig(width=64, height=48, fps=30, pixel_format=PixelFormat.YUYV),
            device_sim=True,
        )
        channels = [ws.Broadcast() for _ in range(2)]
        stop = threading.Event()
        t = threading.Thread(
            target=ws.capture_loop,
            args=(engine, channels, stop, 85, "tpu"), daemon=True,
        )
        t.start()
        try:
            payload, version = channels[1].wait(0, timeout=30.0)
            assert version > 0 and payload[:2] == b"\xff\xd8"
            img = Image.open(io.BytesIO(payload))
            assert img.size == (64, 48)
        finally:
            stop.set()
            t.join(timeout=10)
            engine.close()

    def test_dual_camera_both_modes(self, capsys):
        from examples.dual_camera import run_batched, run_independent

        run_batched(3)
        run_independent(2)
        out = capsys.readouterr().out
        assert "batched mode" in out and "independent mode" in out


def test_fiducials_example(jax_cpu, capsys):
    from examples.fiducials import main

    assert main() == 0
    out = capsys.readouterr().out
    assert "aruco: detected ids [3, 7, 12]" in out
    assert "fiducial demo" in out


def test_calibrate_example(jax_cpu, capsys):
    from examples.calibrate import main

    assert main() == 0
    out = capsys.readouterr().out
    assert "calibration rms" in out and "PASS" in out


def test_panorama_example(jax_cpu, capsys):
    from examples.panorama import main

    assert main() == 0
    assert "reconstruction" in capsys.readouterr().out


def test_video_file_io_example(jax_cpu, capsys):
    import os

    from examples.video_file_io import main

    path = main(n_frames=5, width=64, height=48)
    out = capsys.readouterr().out
    assert "wrote 5 frames" in out and "read 5 frames" in out
    assert "engine tick from file" in out
    os.remove(path)


def test_transcode_example(jax_cpu, tmp_path):
    """AVI→AVI transcode: frame ORDER must be preserved across the strided
    batch (each output frame must match its own input frame, not a
    neighbor — synth frames differ per sequence)."""
    import io

    import numpy as np
    from PIL import Image

    from examples.transcode import make_test_clip, transcode
    from rustcv_tpu.capture.avi import AviMjpegReader

    src = str(tmp_path / "in.avi")
    dst = str(tmp_path / "out.avi")
    make_test_clip(src, n_frames=7, width=128, height=96)  # odd vs batch=3
    n = transcode(src, dst, batch=3, overlay=False)
    assert n == 7
    rin, rout = AviMjpegReader(src), AviMjpegReader(dst)
    assert len(rout) == 7

    def _dec(r, i):
        return np.asarray(
            Image.open(io.BytesIO(r.frame_bytes(i).tobytes())).convert("RGB")
        ).astype(np.float64)

    for i in range(7):
        want = _dec(rin, i)
        got = _dec(rout, i)
        mse = np.mean((want - got) ** 2)
        psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
        assert psnr > 22.0, f"frame {i} mismatched (psnr {psnr:.1f})"
        # and explicitly NOT equal to a different frame
        other = _dec(rin, (i + 3) % 7)
        assert np.mean((other - got) ** 2) > 4 * mse


def test_track_points_example(jax_cpu, capsys):
    from examples.track_points import main

    main(n_frames=4)  # asserts median-flow accuracy internally
    out = capsys.readouterr().out
    assert "tracking locked on the true motion" in out


def test_vision_tour_example(jax_cpu, capsys):
    from examples.vision_tour import main

    steps = main()
    out = capsys.readouterr().out
    assert steps >= 40 and f"vision tour: {steps} stages OK" in out


def test_stabilize_example(jax_cpu, capsys):
    from examples.stabilize import main

    main(n_frames=6)  # asserts motion accuracy + residual reduction
    assert "stabilization locked" in capsys.readouterr().out


def test_spatial_parallel_example(jax_cpu):
    from examples.spatial_parallel import main

    main()  # asserts bit-exactness internally on the 8-device mesh


def test_rgbd_fusion_example(jax_cpu, capsys):
    from examples.rgbd_fusion import main

    assert main() == 0
    out = capsys.readouterr().out
    assert "PASS" in out and "surface:" in out


def test_color_calibration_example(jax_cpu, capsys):
    from examples.color_calibration import main

    assert main() == 0
    out = capsys.readouterr().out
    assert "PASS" in out and "patch error" in out

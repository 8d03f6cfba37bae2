"""Full demo loop — port of ``rustcv/examples/camera_demo.rs:9-113``.

open → set_resolution(640, 480) → read → rectangle → FPS put_text →
imshow → wait_key; Space toggles a 1280×720 hot reload; Esc/Q quits.

Headless-friendly: runs a bounded number of frames by default and the
"display" is the highgui framebuffer (set RUSTCV_TPU_DISPLAY_DIR to also
write PNGs). Keys come from ``highgui.push_key`` or --frames exhaustion.
"""

import argparse

from rustcv_tpu import highgui, imgproc
from rustcv_tpu.capture import SimulationDriver
from rustcv_tpu.core import Mat, TickMeter
from rustcv_tpu.imgproc import Point, Rect, Scalar
from rustcv_tpu.prelude import VideoCapture


def main(frames: int = 120, paced: bool = False) -> None:
    cap = VideoCapture(0, SimulationDriver(paced=paced))
    if not cap.set_resolution(640, 480):
        raise SystemExit("failed to set 640x480")

    mat = Mat()
    tm = TickMeter()
    fps_text = "FPS: --"
    is_hd = False

    for i in range(frames):
        tm.start()
        if not cap.read(mat):
            break
        tm.stop()

        imgproc.rectangle(mat, Rect(60, 60, 200, 150), Scalar(0, 255, 0), 2)
        if tm.get_counter() % 30 == 0 and tm.get_time_sec() > 0:
            fps_text = f"FPS: {tm.get_fps():.1f}"
            tm.reset()
        imgproc.put_text(mat, fps_text, Point(10, 30), 1.0, Scalar(0, 255, 255))

        highgui.imshow("camera_demo", mat)
        key = highgui.wait_key(1)
        if key in (highgui.KEY_ESC, highgui.KEY_Q):
            break
        if key == highgui.KEY_SPACE:  # hot-reload toggle (camera_demo.rs)
            is_hd = not is_hd
            w, h = (1280, 720) if is_hd else (640, 480)
            print(f"hot-swapping to {w}x{h}: {cap.set_resolution(w, h)}")

    print(f"done; final frame {mat.cols}x{mat.rows}, last {fps_text}")
    cap.release()
    highgui.destroy_all_windows()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--paced", action="store_true", help="sensor-rate pacing")
    a = p.parse_args()
    main(a.frames, a.paced)

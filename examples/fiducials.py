"""Fiducials end-to-end: generate ArUco markers and a QR code, composite
them into one scene, then detect and decode both — every stage running
on this framework's own primitives (no external marker data).

Run: python examples/fiducials.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcv_tpu.ops import aruco, calib, qr  # noqa: E402


def main() -> int:
    scene = np.full((360, 520), 215, np.uint8)

    dic = aruco.Dictionary.generate(20, 4, seed=7)
    placed = {3: (40, 40), 12: (40, 400), 7: (260, 60)}
    for mid, (y, x) in placed.items():
        scene[y:y + 48, x:x + 48] = aruco.draw_marker(dic, mid, 8)

    text = "rustcv_tpu fiducial demo"
    code = qr.draw(qr.encode(text, version=2, level="M", mask=2), 5, 4)
    scene[150:150 + code.shape[0], 230:230 + code.shape[1]] = code

    corners, ids = aruco.detect_markers(scene, dic)
    print(f"aruco: detected ids {sorted(ids.tolist())} "
          f"(planted {sorted(placed)})")
    ok_aruco = sorted(ids.tolist()) == sorted(placed)
    for c, mid in zip(corners, ids):
        y, x = placed[int(mid)]
        assert abs(c[0][0] - x) < 3 and abs(c[0][1] - y) < 3

    K = np.array([[500.0, 0, 260], [0, 500.0, 180], [0, 0, 1]])
    rvecs, tvecs = aruco.estimate_pose_single_markers(corners, 0.05, K)
    print(f"aruco poses: {len(rvecs)} markers, "
          f"median |t| {np.median(np.linalg.norm(tvecs, axis=1)):.3f}")

    decoded, quad = qr.detect_and_decode(scene)
    print(f"qr: {decoded!r}")
    ok_qr = decoded == text
    return 0 if (ok_aruco and ok_qr) else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Panorama stitching: SIFT registration + device compositing.

Crops three overlapping views out of a synthetic scene, stitches them
back into one panorama (SIFT → L2 ratio matches → RANSAC homography →
traced-map remap compositing with feather blending), and reports the
reconstruction error against the ground-truth scene.

Run: python examples/panorama.py  (headless; writes panorama.png to cwd
when highgui's PNG sink is available)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustcv_tpu.ops import stitch  # noqa: E402
from rustcv_tpu.ops.sift import _blur  # noqa: E402


def make_scene(seed: int = 11, shape=(240, 520)):
    rng = np.random.default_rng(seed)
    img = _blur(rng.integers(0, 256, shape).astype(np.float64), 2.0)
    return ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)


def main() -> int:
    wide = make_scene()
    crops = [wide[20:220, 0:220], wide[20:220, 150:370],
             wide[20:220, 300:520]]
    print(f"stitching {len(crops)} views of a {wide.shape} scene ...")
    pano, (ox, oy) = stitch.stitch(crops, return_offset=True)
    gt = wide[20:220, 0:520]
    sub = pano[oy:oy + gt.shape[0], ox:ox + gt.shape[1]]
    diff = np.abs(sub[5:-5, 5:-5].astype(int) - gt[5:-5, 5:-5])
    print(f"panorama {pano.shape}, anchor offset ({ox}, {oy})")
    print(f"reconstruction |err| mean {diff.mean():.2f}, "
          f"p99 {np.percentile(diff, 99):.0f}")
    try:
        from rustcv_tpu import highgui
        from rustcv_tpu.core.mat import Mat

        highgui.imshow("panorama", Mat.from_array(pano[..., None]))
        highgui.wait_key(1)
        print("wrote panorama snapshot via highgui sink")
    except Exception:
        pass
    return 0 if diff.mean() < 2.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

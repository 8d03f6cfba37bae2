"""Panorama stitching: overlapping crops reassemble the ground-truth
scene (translation + homography pairs), device compositing matches the
host oracle, failure raises."""

import numpy as np
import pytest

from rustcv_tpu.ops import stitch, warp
from rustcv_tpu.ops.sift import _blur


def _scene(seed=11, shape=(200, 420), blur=2.0):
    rng = np.random.default_rng(seed)
    img = _blur(rng.integers(0, 256, shape).astype(np.float64), blur)
    return ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)


class TestStitch:
    def test_horizontal_pair_reassembles_scene(self):
        wide = _scene()
        left = wide[20:180, 0:240]
        right = wide[20:180, 160:420]
        pano, (ox, oy) = stitch.stitch([left, right], return_offset=True)
        gt = wide[20:180, 0:420]
        sub = pano[oy:oy + 160, ox:ox + 420]
        assert sub.shape == gt.shape
        diff = np.abs(sub[5:-5, 5:-5].astype(int) - gt[5:-5, 5:-5])
        assert diff.mean() < 1.0 and np.percentile(diff, 99) <= 2

    def test_three_images(self):
        wide = _scene()
        crops = [wide[20:180, 0:200], wide[20:180, 120:300],
                 wide[20:180, 220:420]]
        pano, (ox, oy) = stitch.stitch(crops, return_offset=True)
        gt = wide[20:180, 0:420]
        sub = pano[oy:oy + 160, ox:ox + 420]
        diff = np.abs(sub[5:-5, 5:-5].astype(int) - gt[5:-5, 5:-5])
        assert diff.mean() < 1.5

    def test_rotated_pair(self):
        base = _scene(seed=5, shape=(260, 260))
        anchor = base[50:210, 50:210]
        m = warp.get_rotation_matrix_2d((130.0, 130.0), 12.0, 1.0)
        rot = warp.warp_affine_numpy(base, m, (260, 260))
        added = rot[40:220, 40:220]
        pano = stitch.stitch([anchor, added])
        # the anchor area must survive essentially unchanged
        assert pano.shape[0] >= 160 and pano.shape[1] >= 160

    def test_color_pair(self):
        wide = _scene()
        color = np.stack([wide, 255 - wide, wide // 2], axis=-1)
        left, right = color[20:180, 0:240], color[20:180, 160:420]
        g_left, g_right = wide[20:180, 0:240], wide[20:180, 160:420]
        pano, (ox, oy) = stitch.stitch([left, right],
                                       grays=[g_left, g_right],
                                       return_offset=True)
        assert pano.ndim == 3 and pano.shape[-1] == 3
        gt = color[20:180, 0:420]
        sub = pano[oy:oy + 160, ox:ox + 420]
        diff = np.abs(sub[5:-5, 5:-5].astype(int) - gt[5:-5, 5:-5])
        assert diff.mean() < 1.0

    def test_unrelated_images_raise(self):
        a = _scene(seed=1, shape=(120, 120))
        b = _scene(seed=2, shape=(120, 120))
        with pytest.raises(stitch.StitchError):
            stitch.stitch([a, b])

    def test_single_image_raises(self):
        with pytest.raises(ValueError):
            stitch.stitch([_scene(shape=(64, 64))])

    def test_device_composite_matches_host(self, jax_cpu):
        import jax.numpy as jnp

        wide = _scene()
        left = wide[20:180, 0:240]
        right = wide[20:180, 160:420]
        host = stitch.stitch([left, right])
        dev = stitch.stitch([jnp.asarray(left), jnp.asarray(right)])
        assert host.shape == dev.shape
        # different blend arithmetic paths (f64 vs f32, u8-quantized
        # weights) — bounded difference
        diff = np.abs(host.astype(int) - dev.astype(int))
        assert np.mean(diff) < 1.5 and np.percentile(diff, 99) <= 4


class TestMultibandBlend:
    """stitch(blend='multiband'): exposure-mismatched crops fuse
    without a hard seam."""

    @staticmethod
    def _crops():
        rng = np.random.default_rng(9)
        scene = rng.integers(40, 200, (120, 260, 3)).astype(np.float64)
        import cv2 as _cv2

        scene = np.stack([_cv2.GaussianBlur(
            scene[..., c].astype(np.float32), (5, 5), 1.2)
            for c in range(3)], -1).astype(np.float64)
        # add plenty of trackable structure (corners of varied size)
        for _ in range(150):
            y, x = rng.integers(8, 112), rng.integers(8, 252)
            s = rng.integers(2, 6)
            scene[y - s:y + s, x - s:x + s] = rng.integers(0, 255, 3)
        left = np.clip(scene[:, :150] * 1.2, 0, 255).astype(np.uint8)
        right = np.clip(scene[:, 110:] * 0.85, 0, 255).astype(np.uint8)
        return scene, left, right

    def test_smoother_than_feather(self):
        from rustcv_tpu.ops import stitch as st

        scene, left, right = self._crops()
        pano_f, off = st.stitch([left, right], return_offset=True)
        pano_m, off_m = st.stitch([left, right], return_offset=True,
                                  blend="multiband")
        assert pano_m.shape[1] >= 250
        # column-mean jumps (seams) must be smaller under multiband
        def worst_jump(p):
            colmean = p.astype(float).mean(axis=(0, 2))
            inner = colmean[20:-20]
            return np.abs(np.diff(inner)).max()

        assert worst_jump(pano_m) <= worst_jump(pano_f) + 1e-9
        # the gain compensation pulls the two exposures together
        lm = pano_m[:, 40:80].astype(float).mean()
        rm = pano_m[:, -80:-40].astype(float).mean()
        lf = pano_f[:, 40:80].astype(float).mean()
        rf = pano_f[:, -80:-40].astype(float).mean()
        assert abs(lm - rm) < abs(lf - rf) + 1e-9

"""HOG: orientation binning semantics, device/oracle parity, and
end-to-end sliding-window detection of a planted target."""

import numpy as np
import pytest

from rustcv_tpu.ops import hog


def _target(seed=13):
    """A distinctive 128x64 texture."""
    rng = np.random.default_rng(seed)
    t = rng.integers(0, 256, (hog.WIN_H, hog.WIN_W)).astype(np.uint8)
    t[32:96, 16:48] = 230  # bright core with strong edges
    t[40:88, 24:40] = 20
    return t


class TestCells:
    def test_constant_image_zero_energy(self):
        c = hog.hog_cells_numpy(np.full((64, 64), 120, np.uint8))
        assert np.abs(c).max() < 1e-9

    def test_vertical_stripes_bin_zero(self):
        img = np.zeros((64, 64), np.uint8)
        img[:, ::2] = 200  # pure horizontal gradient → ang 0/180 → bin 0⊕8
        c = hog.hog_cells_numpy(img)
        total = c.sum(axis=(0, 1))
        assert (total[0] + total[8]) / total.sum() > 0.99

    def test_horizontal_stripes_mid_bin(self):
        img = np.zeros((64, 64), np.uint8)
        img[::2, :] = 200  # vertical gradient → ang 90 → b=4.0 → bin 4
        c = hog.hog_cells_numpy(img)
        total = c.sum(axis=(0, 1))
        assert total[4] / total.sum() > 0.95

    def test_energy_conservation(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        c = hog.hog_cells_numpy(img)
        a = img.astype(np.float64)
        p = np.pad(a, 1, mode="edge")
        dx = (p[1:-1, 2:] - p[1:-1, :-2]) * 0.5
        dy = (p[2:, 1:-1] - p[:-2, 1:-1]) * 0.5
        mag = np.hypot(dx, dy)
        # interior magnitude fully distributed; border rows/cols may drop
        assert c.sum() <= mag.sum() + 1e-9
        assert c.sum() >= mag[4:-4, 4:-4].sum() - 1e-9

    def test_non_multiple_of_8_raises(self):
        with pytest.raises(ValueError):
            hog.hog_cells_numpy(np.zeros((60, 64), np.uint8))


class TestDeviceTwin:
    def test_blocks_match(self, jax_cpu):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (128, 96)).astype(np.uint8)
        g = hog.hog_blocks_numpy(img)
        d = np.asarray(hog.hog_blocks(img))
        assert g.shape == d.shape == (15, 11, 36)
        np.testing.assert_allclose(d, g, atol=2e-4)

    def test_score_map_matches(self, jax_cpu):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (160, 128)).astype(np.uint8)
        w = rng.normal(0, 1, 3780)
        g = hog.hog_score_map_numpy(img, w, 0.5)
        d = np.asarray(hog.hog_score_map(
            jnp.asarray(img), jnp.asarray(w, jnp.float32), jnp.float32(0.5)))
        assert g.shape == d.shape
        np.testing.assert_allclose(d, g, atol=1e-2)


class TestDetect:
    def _scene_and_svm(self):
        rng = np.random.default_rng(21)
        scene = rng.integers(60, 196, (256, 256)).astype(np.uint8)
        tgt = _target()
        ty, tx = 64, 96
        scene[ty:ty + hog.WIN_H, tx:tx + hog.WIN_W] = tgt
        d_t = hog.hog_window_numpy(tgt)
        # background descriptors from target-free windows
        bgs = []
        for yy in (0, 64, 120):
            for xx in (0, 100, 180):
                win = rng.integers(60, 196,
                                   (hog.WIN_H, hog.WIN_W)).astype(np.uint8)
                bgs.append(hog.hog_window_numpy(win))
        w = d_t - np.mean(bgs, axis=0)
        b = -0.5 * (w @ d_t + np.max([w @ g for g in bgs]))
        return scene, w, b, (tx, ty)

    def test_finds_planted_target(self):
        scene, w, b, (tx, ty) = self._scene_and_svm()
        boxes, scores = hog.detect_multi_scale(scene, w, b, threshold=0.0)
        assert len(boxes) >= 1
        best = boxes[np.argmax(scores)]
        assert abs(best[0] - tx) <= 8 and abs(best[1] - ty) <= 8
        assert best[2] == hog.WIN_W and best[3] == hog.WIN_H

    def test_device_path_agrees(self, jax_cpu):
        scene, w, b, (tx, ty) = self._scene_and_svm()
        bh, sh = hog.detect_multi_scale(scene, w, b, threshold=0.0)
        bd, sd = hog.detect_multi_scale(scene, w, b, threshold=0.0,
                                        use_device=True)
        best_h = bh[np.argmax(sh)]
        best_d = bd[np.argmax(sd)]
        np.testing.assert_array_equal(best_h, best_d)

    def test_no_detection_in_noise(self):
        scene, w, b, _ = self._scene_and_svm()
        rng = np.random.default_rng(99)
        noise = rng.integers(60, 196, (256, 256)).astype(np.uint8)
        boxes, _ = hog.detect_multi_scale(noise, w, b, threshold=0.0)
        assert len(boxes) == 0

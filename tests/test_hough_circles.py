"""HoughCircles — synthetic circle recovery + device/oracle agreement."""

import numpy as np
import pytest

from rustcv_tpu.ops import hough


def _draw_circles(h, w, circles, bg=30, fg=200):
    """Filled anti-alias-free disks on a flat background."""
    img = np.full((h, w), bg, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for (cx, cy, r) in circles:
        img[(xx - cx) ** 2 + (yy - cy) ** 2 <= r * r] = fg
    return img


class TestHoughCircles:
    def test_single_circle_recovered(self, jax_cpu):
        img = _draw_circles(120, 160, [(80, 60, 25)])
        circ, valid, votes = hough.hough_circles(
            img, dp=2, min_radius=15, max_radius=40)
        got = np.asarray(circ)[np.asarray(valid)]
        assert len(got) >= 1
        cx, cy, r = got[0]
        assert abs(cx - 80) <= 2 and abs(cy - 60) <= 2 and abs(r - 25) <= 2

    def test_multiple_circles(self, jax_cpu):
        spec = [(40, 40, 18), (120, 50, 25), (70, 100, 15)]
        img = _draw_circles(140, 170, spec)
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat
        import jax.numpy as jnp

        got = imgproc.hough_circles(
            Mat.from_device(jnp.asarray(img)), dp=2, min_dist=25,
            min_radius=10, max_radius=35)
        assert len(got) == 3
        for (cx, cy, r) in spec:
            d = np.hypot(got[:, 0] - cx, got[:, 1] - cy)
            k = int(np.argmin(d))
            assert d[k] <= 3 and abs(got[k, 2] - r) <= 2

    def test_device_matches_oracle(self, jax_cpu):
        img = _draw_circles(100, 120, [(60, 50, 20), (25, 70, 12)])
        circ, valid, votes = hough.hough_circles(
            img, dp=2, min_radius=8, max_radius=30)
        ora_c, ora_v = hough.hough_circles_numpy(
            img, dp=2, min_radius=8, max_radius=30)
        got = np.asarray(circ)[np.asarray(valid)]
        # same circle set (order may differ within equal votes)
        assert len(got) == len(ora_c)
        for c in ora_c:
            d = np.hypot(got[:, 0] - c[0], got[:, 1] - c[1]) + np.abs(got[:, 2] - c[2])
            assert d.min() < 1e-5

    def test_dark_on_bright(self, jax_cpu):
        """Gradient points the other way — both directions vote, so dark
        disks on bright background are found too."""
        img = _draw_circles(100, 120, [(60, 50, 20)], bg=220, fg=40)
        circ, valid, _ = hough.hough_circles(img, dp=2, min_radius=15,
                                             max_radius=30)
        got = np.asarray(circ)[np.asarray(valid)]
        assert len(got) >= 1
        assert abs(got[0, 0] - 60) <= 2 and abs(got[0, 2] - 20) <= 2

    def test_no_circles_blank(self, jax_cpu):
        img = np.full((80, 80), 128, np.uint8)
        circ, valid, _ = hough.hough_circles(img, dp=2)
        assert not np.asarray(valid).any()

    def test_min_dist_dedup(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _draw_circles(100, 120, [(60, 50, 20)])
        got = imgproc.hough_circles(Mat.from_array(img), dp=2, min_dist=50,
                                    min_radius=10, max_radius=35)
        assert len(got) == 1  # satellite bins suppressed

    def test_grid_cap_raises(self, jax_cpu):
        with pytest.raises(ValueError, match="raise dp"):
            hough.hough_circles(np.zeros((2048, 2048), np.uint8), dp=2)

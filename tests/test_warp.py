"""Affine warp: device vs float64 oracle (bit-exact — shared coordinate
tables), identity/translation/rotation semantics, borders, facade."""

import numpy as np
import pytest

from rustcv_tpu.ops import golden
from rustcv_tpu.ops import warp as wp


def _rand(rng, h, w, c=3):
    return rng.integers(0, 256, size=(h, w, c) if c else (h, w), dtype=np.uint8)


IDENTITY = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


class TestWarpAffine:
    @pytest.mark.parametrize("mode", wp.MODES)
    @pytest.mark.parametrize("border", wp.BORDERS)
    def test_device_bit_exact_vs_oracle(self, rng, jax_cpu, mode, border):
        img = _rand(rng, 37, 53)
        m = wp.get_rotation_matrix_2d((20.0, 15.0), 33.0, 1.2)
        want = wp.warp_affine_numpy(img, m, (41, 29), mode, border)
        got = np.asarray(wp.warp_affine(img, m, (41, 29), mode, border))
        np.testing.assert_array_equal(got, want)

    def test_identity_is_exact_copy(self, rng, jax_cpu):
        img = _rand(rng, 24, 32)
        out = np.asarray(wp.warp_affine(img, IDENTITY, (32, 24)))
        np.testing.assert_array_equal(out, img)

    def test_integer_translation(self, rng, jax_cpu):
        img = _rand(rng, 24, 32)
        m = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, 3.0]])  # shift +5x, +3y
        out = np.asarray(wp.warp_affine(img, m, (32, 24)))
        np.testing.assert_array_equal(out[3:, 5:], img[:-3, :-5])
        assert np.all(out[:3] == 0) and np.all(out[:, :5] == 0)  # constant border

    def test_rotate_90_exact(self, rng, jax_cpu):
        """±90° about the center of a square image hits integer coords —
        must equal np.rot90 exactly."""
        img = _rand(rng, 33, 33)
        c = ((33 - 1) / 2.0, (33 - 1) / 2.0)
        m = wp.get_rotation_matrix_2d(c, 90.0)
        out = np.asarray(wp.warp_affine(img, m, (33, 33)))
        np.testing.assert_array_equal(out, np.rot90(img, 1, axes=(0, 1)))

    def test_replicate_border(self, rng, jax_cpu):
        img = _rand(rng, 16, 16)
        m = np.array([[1.0, 0.0, 4.0], [0.0, 1.0, 0.0]])
        out = np.asarray(wp.warp_affine(img, m, (16, 16), border="replicate"))
        # columns left of the shift replicate column 0
        for x in range(4):
            np.testing.assert_array_equal(out[:, x], img[:, 0])

    def test_gray_2d_input(self, rng, jax_cpu):
        img = _rand(rng, 20, 28, c=0)
        m = wp.get_rotation_matrix_2d((10.0, 10.0), 15.0)
        want = wp.warp_affine_numpy(img, m, (28, 20))
        got = np.asarray(wp.warp_affine(img, m, (28, 20)))
        np.testing.assert_array_equal(got, want)

    def test_rejects_bad_args(self, rng):
        img = _rand(rng, 8, 8)
        with pytest.raises(ValueError):
            wp.warp_affine(img, IDENTITY, (8, 8), mode="cubic")
        with pytest.raises(ValueError):
            wp.warp_affine(img, IDENTITY, (8, 8), border="reflect")

    def test_imgproc_facade_rotate(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _rand(rng, 33, 33)
        out = imgproc.rotate(Mat.from_array(img), 90.0)
        np.testing.assert_array_equal(out.to_numpy(), np.rot90(img, 1, axes=(0, 1)))
        import jax.numpy as jnp

        out_d = imgproc.rotate(Mat.from_device(jnp.asarray(img)), 90.0)
        np.testing.assert_array_equal(out_d.to_numpy(), out.to_numpy())

    @pytest.mark.parametrize("border", wp.BORDERS)
    def test_remap_bit_exact(self, rng, jax_cpu, border):
        img = _rand(rng, 37, 53)
        gy, gx = np.meshgrid(
            np.arange(29, dtype=np.float32), np.arange(41, dtype=np.float32),
            indexing="ij",
        )
        mx = gx + 3.0 * np.sin(gy / 7.0)
        my = gy + 2.0 * np.cos(gx / 9.0)
        want = wp.remap_numpy(img, mx, my, border)
        got = np.asarray(wp.remap(img, mx, my, border))
        np.testing.assert_array_equal(got, want)

    def test_remap_identity_and_warp_equivalence(self, rng, jax_cpu):
        """Identity maps copy exactly; remap with affine-generated maps
        matches warp_affine (same spec, traced vs baked coordinates)."""
        img = _rand(rng, 24, 32)
        iy, ix = np.meshgrid(
            np.arange(24, dtype=np.float32), np.arange(32, dtype=np.float32),
            indexing="ij",
        )
        np.testing.assert_array_equal(np.asarray(wp.remap(img, ix, iy)), img)
        m = wp.get_rotation_matrix_2d((15.0, 11.0), 20.0)
        minv = wp._invert_affine(m)
        mx = (minv[0, 0] * ix + minv[0, 1] * iy + minv[0, 2]).astype(np.float32)
        my = (minv[1, 0] * ix + minv[1, 1] * iy + minv[1, 2]).astype(np.float32)
        via_remap = np.asarray(wp.remap(img, mx, my))
        via_warp = np.asarray(wp.warp_affine(img, m, (32, 24)))
        # identical spec; tiny f32-vs-f64 coordinate rounding may flip the
        # 1/2048 weight on a handful of boundary pixels
        diff = np.abs(via_remap.astype(int) - via_warp.astype(int))
        assert (diff > 1).mean() < 0.01 and diff.max() <= 60

    def test_imgproc_remap_facade(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _rand(rng, 20, 28)
        iy, ix = np.meshgrid(
            np.arange(20, dtype=np.float32), np.arange(28, dtype=np.float32),
            indexing="ij",
        )
        out = imgproc.remap(Mat.from_array(img), ix, iy)
        np.testing.assert_array_equal(out.to_numpy(), img)

    @pytest.mark.parametrize("mode", wp.MODES)
    @pytest.mark.parametrize("border", wp.BORDERS)
    def test_perspective_bit_exact(self, rng, jax_cpu, mode, border):
        img = _rand(rng, 40, 56)
        H = wp.get_perspective_transform(
            [(0, 0), (55, 0), (55, 39), (0, 39)],
            [(5, 3), (50, 0), (55, 39), (0, 36)],
        )
        want = wp.warp_perspective_numpy(img, H, (56, 40), mode, border)
        got = np.asarray(wp.warp_perspective(img, H, (56, 40), mode, border))
        np.testing.assert_array_equal(got, want)

    def test_perspective_transform_maps_corners_exactly(self):
        src4 = [(0, 0), (55, 0), (55, 39), (0, 39)]
        dst4 = [(5, 3), (50, 0), (55, 39), (0, 36)]
        H = wp.get_perspective_transform(src4, dst4)
        for (x, y), (u, v) in zip(src4, dst4):
            p = H @ np.array([x, y, 1.0])
            p /= p[2]
            np.testing.assert_allclose(p[:2], [u, v], atol=1e-9)

    def test_perspective_affine_equivalence(self, rng, jax_cpu):
        """An affine homography must produce EXACTLY warp_affine's bytes."""
        img = _rand(rng, 40, 56)
        m = wp.get_rotation_matrix_2d((28.0, 20.0), 15.0)
        h3 = np.vstack([m, [0, 0, 1]])
        np.testing.assert_array_equal(
            np.asarray(wp.warp_perspective(img, h3, (56, 40))),
            np.asarray(wp.warp_affine(img, m, (56, 40))),
        )

    def test_imgproc_perspective_facade(self, rng, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = _rand(rng, 30, 40)
        out = imgproc.warp_perspective(Mat.from_array(img), np.eye(3), (40, 30))
        np.testing.assert_array_equal(out.to_numpy(), img)

    def test_rotation_matrix_matches_cv_convention(self):
        m = wp.get_rotation_matrix_2d((0.0, 0.0), 90.0)
        # (1, 0) rotates CCW (y-down) onto (0, -1)
        v = m[:, :2] @ np.array([1.0, 0.0])
        np.testing.assert_allclose(v, [0.0, -1.0], atol=1e-12)

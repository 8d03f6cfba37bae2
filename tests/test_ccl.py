"""Connected components: segmented-scan device labeling vs the BFS oracle
on random, structured, and adversarial masks."""

import numpy as np
import pytest

from rustcv_tpu.ops import ccl


def _spiral(n: int) -> np.ndarray:
    s = np.zeros((n, n), np.uint8)
    x0 = y0 = 0
    x1 = y1 = n - 1
    while x0 <= x1:
        s[y0, x0 : x1 + 1] = 1
        s[y0 : y1 + 1, x1] = 1
        s[y1, x0 : x1 + 1] = 1
        s[y0 + 2 : y1 + 1, x0] = 1
        x0 += 2
        y0 += 2
        x1 -= 2
        y1 -= 2
    return s


class TestConnectedComponents:
    @pytest.mark.parametrize(
        "name,mask",
        [
            ("empty", np.zeros((12, 15), np.uint8)),
            ("full", np.ones((12, 15), np.uint8)),
            ("diag", np.eye(12, dtype=np.uint8)),  # 4-conn: 12 separate
            ("spiral", _spiral(31)),
        ],
    )
    def test_matches_bfs_oracle(self, jax_cpu, name, mask):
        n, lab = ccl.connected_components(mask)
        n2, lab2 = ccl.connected_components_numpy(mask)
        assert n == n2
        np.testing.assert_array_equal(lab, lab2)

    @pytest.mark.parametrize("density", [0.3, 0.5, 0.7])
    def test_random_masks(self, rng, jax_cpu, density):
        mask = (rng.random((48, 64)) < density).astype(np.uint8)
        n, lab = ccl.connected_components(mask)
        n2, lab2 = ccl.connected_components_numpy(mask)
        assert n == n2
        np.testing.assert_array_equal(lab, lab2)
        # labels invariants
        assert lab.max() == n
        assert np.array_equal(np.unique(lab[mask != 0]), np.arange(1, n + 1))
        assert np.all(lab[mask == 0] == 0)

    def test_deep_spiral_exact(self, jax_cpu):
        """The run-graph algorithm is exact in ONE pass — a deep spiral
        (the old fixpoint formulation's worst case, which needed an
        iteration budget and could fail it) labels correctly regardless of
        max_rounds."""
        mask = _spiral(31)
        n, lab = ccl.connected_components(mask, max_rounds=1)
        n2, lab2 = ccl.connected_components_numpy(mask)
        assert n == n2
        np.testing.assert_array_equal(lab, lab2)

    def test_with_stats(self, jax_cpu):
        mask = np.zeros((40, 60), np.uint8)
        mask[5:15, 10:20] = 255   # 10x10 at (10,5)
        mask[25:30, 40:55] = 255  # 15x5 at (40,25)
        n, lab, stats, cents = ccl.connected_components_with_stats(mask)
        assert n == 2
        np.testing.assert_array_equal(stats[1], [10, 5, 10, 10, 100])
        np.testing.assert_array_equal(stats[2], [40, 25, 15, 5, 75])
        np.testing.assert_allclose(cents[1], [14.5, 9.5])
        np.testing.assert_allclose(cents[2], [47.0, 27.0])
        assert stats[0, 4] == 40 * 60 - 175  # background area

    def test_flood_fill(self, jax_cpu):
        img = np.full((20, 30), 100, np.uint8)
        img[5:15, 5:20] = 50      # a darker region
        img[8:12, 25:28] = 50     # disconnected same-value region
        out, count, mask = ccl.flood_fill(img, (10, 10), 200)
        assert count == 10 * 15
        assert np.all(out[5:15, 5:20] == 200)
        assert np.all(out[8:12, 25:28] == 50)  # disconnected: untouched
        assert mask.sum() == count * 255
        # tolerance: fill the 100-background from a corner with ±0 range
        out2, count2, _ = ccl.flood_fill(img, (0, 0), 7)
        assert out2[0, 0] == 7 and out2[10, 10] == 50
        assert count2 == 20 * 30 - 10 * 15 - 4 * 3
        with pytest.raises(ValueError):
            ccl.flood_fill(img, (99, 99), 1)

    def test_find_contours_shapes(self, jax_cpu):
        # 3×3 square → its 8 boundary pixels, clockwise from the top-left
        m = np.zeros((8, 8), np.uint8)
        m[1:4, 2:5] = 1
        (c,) = ccl.find_contours(m)
        assert c.tolist() == [
            [2, 1], [3, 1], [4, 1], [4, 2], [4, 3], [3, 3], [2, 3], [2, 2]
        ]
        # single pixel → 1-point contour
        m2 = np.zeros((4, 4), np.uint8)
        m2[2, 2] = 1
        assert ccl.find_contours(m2)[0].tolist() == [[2, 2]]
        # 1-px line → out-and-back trace, no duplicated seam point
        m3 = np.zeros((4, 8), np.uint8)
        m3[1, 1:6] = 1
        line = ccl.find_contours(m3)[0]
        assert line[0].tolist() == [1, 1] and len(line) == 8

    def test_find_contours_random_properties(self, rng, jax_cpu):
        """Every contour point lies on its own component; each component's
        extreme pixels appear on its contour."""
        mask = (rng.random((40, 50)) > 0.65).astype(np.uint8)
        n, lab = ccl.connected_components(mask)
        cs = ccl.find_contours(mask)
        assert len(cs) == n
        for comp, c in enumerate(cs, 1):
            assert all(lab[y, x] == comp for x, y in c)
            ys, xs = np.nonzero(lab == comp)
            pts = set(map(tuple, c.tolist()))
            assert (int(xs.min()), int(ys[xs == xs.min()].min())) in pts
            assert (int(xs.max()), int(ys[xs == xs.max()].min())) in pts

    def test_imgproc_facade_with_inrange(self, jax_cpu):
        """Segmentation flow: mask → components → blob count/centroids."""
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        img = np.zeros((60, 80, 3), np.uint8)
        img[10:20, 10:25] = (0, 0, 255)
        img[35:50, 40:70] = (0, 0, 255)
        hsv = imgproc.cvt_hsv(Mat.from_array(img))
        mask = imgproc.in_range(hsv, (0, 100, 100), (10, 255, 255))
        n, lab = imgproc.connected_components(mask)
        assert n == 2
        assert (lab == 1).sum() == 10 * 15
        assert (lab == 2).sum() == 15 * 30


class TestHuMoments:
    def test_invariance(self, jax_cpu):
        """Hu moments are (approximately) invariant to translation,
        scale, and rotation of a shape; matchShapes ≈ 0 for the same
        shape, larger for a different one."""
        from rustcv_tpu.ops import golden, warp

        base = np.zeros((120, 120), np.uint8)
        base[40:80, 30:90] = 255  # a 2:3 rectangle
        h0 = golden.hu_moments(base)
        # translated
        t = np.zeros_like(base)
        t[50:90, 20:80] = 255
        assert np.abs(golden.hu_moments(t) - h0).max() < 1e-12
        # scaled ×1.5
        s = np.zeros_like(base)
        s[30:90, 15:105] = 255
        assert np.abs(golden.hu_moments(s)[:4] - h0[:4]).max() < 1e-3
        # rotated 30°
        m = warp.get_rotation_matrix_2d((60.0, 60.0), 30.0)
        r = warp.warp_affine_numpy(base, m, (120, 120), mode="nearest")
        assert np.abs(golden.hu_moments(r)[:2] - h0[:2]).max() < 2e-3
        # matchShapes: same-family shapes close, disc far
        assert golden.match_shapes(base, r) < 0.5
        disc = golden.circle_mask(120, 120, (60, 60), 35, -1)
        assert golden.match_shapes(base, disc) > golden.match_shapes(base, r)

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        m = np.zeros((60, 60), np.uint8)
        m[20:40, 15:45] = 255
        hm = imgproc.hu_moments(Mat.from_array(m))
        assert hm.shape == (7,)
        assert imgproc.match_shapes(Mat.from_array(m), Mat.from_array(m)) == 0.0


class TestDistanceTransform:
    @pytest.mark.parametrize("density", [0.3, 0.7, 0.95])
    def test_matches_bfs_oracle(self, rng, jax_cpu, density):
        mask = (rng.random((40, 56)) < density).astype(np.uint8)
        got = ccl.distance_transform_l1(mask)
        want = ccl.distance_transform_l1_numpy(mask)
        np.testing.assert_array_equal(got, want)

    def test_single_source_is_manhattan(self, jax_cpu):
        m = np.ones((20, 30), np.uint8)
        m[7, 13] = 0
        d = ccl.distance_transform_l1(m)
        ys, xs = np.mgrid[0:20, 0:30]
        np.testing.assert_array_equal(d, np.abs(ys - 7) + np.abs(xs - 13))

    def test_facade(self, jax_cpu):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        m = np.ones((16, 16), np.uint8)
        m[8, 8] = 0
        d = imgproc.distance_transform(Mat.from_array(m))
        assert d[8, 8] == 0 and d[0, 0] == 16

"""KNN background subtractor: learns a static scene, flags movers,
absorbs scene changes, device == oracle bit-exact decisions."""

import numpy as np

from rustcv_tpu.ops import knn_bgsub as knn


def _clip(n=24, size=(40, 56), seed=2):
    rng = np.random.default_rng(seed)
    bg = rng.integers(40, 90, size).astype(np.uint8)
    frames = []
    for t in range(n):
        f = bg + rng.integers(-3, 4, size).astype(np.int16)
        f = np.clip(f, 0, 255).astype(np.uint8)
        if t >= 10:
            x = 6 + 2 * (t - 10)
            f[14:26, x:x + 8] = 230  # mover
        frames.append(f)
    return frames


class TestKNN:
    def test_learns_then_detects_mover(self, jax_cpu):
        frames = _clip()
        st = knn.knn_init(frames[0])
        masks = []
        for f in frames:
            st, fg = knn.knn_step(st, f)
            masks.append(np.asarray(fg))
        # static scene reads background from the start (seeded bank)
        assert masks[9].mean() < 0.02 and masks[0].mean() < 0.02
        # the mover is flagged
        t = 16
        x = 6 + 2 * (t - 10)
        assert masks[t][14:26, x:x + 8].mean() > 0.9
        # and the rest of the frame stays clean
        clean = masks[t].copy()
        clean[12:28, x - 4:x + 12] = False
        assert clean.mean() < 0.02

    def test_absorbs_scene_change(self, jax_cpu):
        size = (24, 32)
        a = np.full(size, 60, np.uint8)
        b = np.full(size, 200, np.uint8)
        st = knn.knn_init(a)
        for _ in range(8):
            st, _ = knn.knn_step(st, a)
        p = knn.KNNParams(n_fg_max=5)
        # scene jumps to b: foreground at first...
        for i in range(5):
            st, fg = knn.knn_step(st, b, p)
            assert np.asarray(fg).all()
        # ...then the counter forces absorption; within N frames b is bg
        for _ in range(8):
            st, fg = knn.knn_step(st, b, p)
        assert not np.asarray(fg).any()

    def test_device_matches_oracle(self, jax_cpu):
        frames = _clip(n=16)
        dst = knn.knn_init(frames[0])
        gst = knn.knn_init_numpy(frames[0])
        for f in frames:
            dst, dfg = knn.knn_step(dst, f)
            gst, gfg = knn.knn_step_numpy(gst, f)
            np.testing.assert_array_equal(np.asarray(dfg), gfg)
        np.testing.assert_allclose(np.asarray(dst.samples),
                                   gst["samples"], atol=1e-5)

    def test_object_api_color(self, jax_cpu):
        rng = np.random.default_rng(5)
        sub = knn.BackgroundSubtractorKNN()
        bg = rng.integers(0, 120, (24, 32, 3)).astype(np.uint8)
        for _ in range(8):
            m = sub.apply(bg)
        assert m.dtype == np.uint8 and m.shape == (24, 32)
        assert m.mean() < 5
        moved = bg.copy()
        moved[6:18, 10:20] = (250, 250, 250)
        m2 = sub.apply(moved)
        assert m2[8:16, 12:18].min() == 255
        assert sub.background().shape == bg.shape

"""MOG2 background subtraction — device == oracle, plus the behavioral
properties: static scenes converge to background, moving objects flag as
foreground, bimodal (flickering) backgrounds absorb both modes."""

import numpy as np
import pytest

from rustcv_tpu.ops import bgsub


class TestMOG2:
    def test_device_matches_oracle(self, jax_cpu):
        rng = np.random.default_rng(0)
        h, w = 12, 16
        state_d = bgsub.mog2_init((h, w))
        state_n = tuple(np.asarray(s) for s in state_d)
        for t in range(8):
            frame = (100 + rng.normal(0, 3, (h, w))).clip(0, 255).astype(np.uint8)
            if t >= 5:
                frame[4:8, 6:10] = 220  # an object appears
            state_d, fg_d = bgsub.mog2_step(state_d, frame)
            state_n, fg_n = bgsub.mog2_step_numpy(state_n, frame)
            assert np.array_equal(np.asarray(fg_d), fg_n), f"frame {t}"
            for a, b in zip(state_d, state_n):
                np.testing.assert_allclose(np.asarray(a), b, atol=1e-4)

    def test_static_scene_goes_background(self, jax_cpu):
        rng = np.random.default_rng(1)
        base = rng.integers(0, 256, (24, 32), np.uint8)
        sub = bgsub.BackgroundSubtractorMOG2()
        for _ in range(20):
            noisy = (base.astype(int) + rng.integers(-2, 3, base.shape)).clip(0, 255)
            fg = sub.apply(noisy.astype(np.uint8))
        assert fg.mean() < 0.01
        assert np.abs(sub.background.astype(int) - base.astype(int)).mean() < 4

    def test_moving_object_flags_foreground(self, jax_cpu):
        rng = np.random.default_rng(2)
        base = rng.integers(40, 120, (24, 32), np.uint8)
        sub = bgsub.BackgroundSubtractorMOG2(alpha=0.05)
        for _ in range(30):
            fg = sub.apply(base)
        frame = base.copy()
        frame[10:16, 12:20] = 250
        fg = sub.apply(frame)
        assert fg[10:16, 12:20].mean() > 0.95
        outside = fg.copy()
        outside[10:16, 12:20] = False
        assert outside.mean() < 0.02

    def test_object_absorbed_after_dwell(self, jax_cpu):
        """A stopped object becomes background once its component's weight
        crosses the ratio prefix."""
        base = np.full((16, 16), 60, np.uint8)
        sub = bgsub.BackgroundSubtractorMOG2(alpha=0.08)
        for _ in range(20):
            sub.apply(base)
        frame = base.copy()
        frame[4:12, 4:12] = 200
        flagged = []
        for _ in range(80):
            fg = sub.apply(frame)
            flagged.append(fg[6, 6])
        assert flagged[0]  # foreground at first
        assert not flagged[-1]  # absorbed eventually

    def test_bimodal_background(self, jax_cpu):
        """A pixel flickering between two values (e.g. blinking light)
        should eventually match both modes as background."""
        sub = bgsub.BackgroundSubtractorMOG2(alpha=0.05)
        rng = np.random.default_rng(3)
        vals = [50, 180]
        last_fg = None
        for t in range(120):
            v = vals[rng.integers(0, 2)]
            frame = np.full((8, 8), v, np.uint8)
            last_fg = sub.apply(frame)
        assert last_fg.mean() < 0.05

    def test_color_frames(self, jax_cpu):
        rng = np.random.default_rng(4)
        base = rng.integers(0, 256, (12, 16, 3), np.uint8)
        state_d = bgsub.mog2_init(base.shape)
        state_n = tuple(np.asarray(s) for s in state_d)
        for t in range(5):
            f = (base.astype(int) + rng.integers(-2, 3, base.shape)).clip(0, 255).astype(np.uint8)
            if t == 4:
                f[3:6, 4:8] = [255, 0, 0]
            state_d, fg_d = bgsub.mog2_step(state_d, f)
            state_n, fg_n = bgsub.mog2_step_numpy(state_n, f)
            assert np.array_equal(np.asarray(fg_d), fg_n)
        assert fg_n[4, 5] and not fg_n[0, 0]

    def test_scan_compatible(self, jax_cpu):
        """mog2_step threads through lax.scan (clip-at-once processing)."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        clip = rng.integers(90, 110, (6, 8, 10), np.uint8)
        clip[4:, 2:5, 3:7] = 240
        state = bgsub.mog2_init((8, 10))

        def step(s, f):
            return bgsub.mog2_step(s, f)

        _, masks = jax.lax.scan(step, state, jnp.asarray(clip))
        assert masks.shape == (6, 8, 10)
        assert np.asarray(masks)[5, 3, 4]

    def test_background_before_apply_raises(self, jax_cpu):
        with pytest.raises(RuntimeError, match="apply"):
            bgsub.BackgroundSubtractorMOG2().background


class TestShadows:
    def test_shadow_marked_127(self, jax_cpu):
        from rustcv_tpu.ops.bgsub import BackgroundSubtractorMOG2

        rng = np.random.default_rng(3)
        bg = rng.integers(90, 200, (40, 50, 3)).astype(np.uint8)
        sub = BackgroundSubtractorMOG2(detect_shadows=True)
        for _ in range(30):
            noisy = np.clip(bg.astype(float)
                            + rng.normal(0, 2, bg.shape), 0,
                            255).astype(np.uint8)
            out = sub.apply(noisy)
        frame = bg.astype(float).copy()
        frame[10:20, 10:20] *= 0.6          # photometric shadow
        frame[25:35, 30:42] = [200, 30, 30]  # a real object (chroma)
        out = sub.apply(np.clip(frame, 0, 255).astype(np.uint8))
        shadow_region = out[12:18, 12:18]
        object_region = out[27:33, 32:40]
        still_bg = out[2:8, 2:8]
        assert (shadow_region == 127).mean() > 0.7
        assert (object_region == 255).mean() > 0.7
        assert (still_bg == 0).mean() > 0.9

    def test_shadows_off_binary(self, jax_cpu):
        from rustcv_tpu.ops.bgsub import BackgroundSubtractorMOG2

        rng = np.random.default_rng(3)
        bg = rng.integers(90, 200, (20, 24, 3)).astype(np.uint8)
        sub = BackgroundSubtractorMOG2()
        for _ in range(10):
            sub.apply(bg)
        out = sub.apply(bg)
        assert set(np.unique(np.asarray(out)).tolist()) <= {0, 1, 255}

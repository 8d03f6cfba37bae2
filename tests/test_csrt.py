"""CSRT tracker: trajectory on known motion, spatial-reliability mask
semantics, device twin vs f64 oracle, failure handling, object API,
vmap banks."""

import numpy as np

from rustcv_tpu.ops import csrt


def _scene(n_frames=12, size=(120, 160), start=(40, 50), vel=(2, 3),
           seed=3, target=32):
    h, w = size
    t2 = target // 2
    rng = np.random.default_rng(seed)
    bg = rng.integers(20, 60, (h, w)).astype(np.uint8)
    tex = rng.integers(120, 255, (target, target)).astype(np.uint8)
    frames, centers = [], []
    cy, cx = start
    for _ in range(n_frames):
        f = bg.copy()
        y0, x0 = cy - t2, cx - t2
        ys = slice(max(y0, 0), min(y0 + target, h))
        xs = slice(max(x0, 0), min(x0 + target, w))
        f[ys, xs] = tex[ys.start - y0:ys.stop - y0,
                        xs.start - x0:xs.stop - x0]
        frames.append(f)
        centers.append((cy, cx))
        cy, cx = cy + vel[0], cx + vel[1]
    return np.stack(frames), centers


class TestOracle:
    def test_tracks_constant_velocity(self):
        frames, centers = _scene()
        cy, cx = centers[0]
        st = csrt.csrt_init(frames[0], (cx - 16, cy - 16, 32, 32))
        for t in range(1, len(frames)):
            st, ok, peak = csrt.csrt_step(st, frames[t])
            assert ok and peak > csrt.DETECT_THRESH
            assert abs(st["center"][0] - centers[t][0]) <= 1
            assert abs(st["center"][1] - centers[t][1]) <= 1

    def test_failure_freezes_state(self):
        frames, centers = _scene(n_frames=4)
        cy, cx = centers[0]
        st = csrt.csrt_init(frames[0], (cx - 16, cy - 16, 32, 32))
        st, ok, _ = csrt.csrt_step(st, frames[1])
        assert ok
        blank = np.full_like(frames[0], 37)
        st2, ok2, peak2 = csrt.csrt_step(st, blank)
        assert not ok2 and peak2 < csrt.DETECT_THRESH
        assert st2["center"] == st["center"]
        np.testing.assert_array_equal(st2["g"], st["g"])

    def test_tiny_target_raises(self):
        frames, _ = _scene(n_frames=1)
        try:
            csrt.csrt_init(frames[0], (10, 10, 4, 4))
            assert False
        except ValueError:
            pass


class TestSpatialReliability:
    def test_mask_concentrates_on_foreground(self):
        # bright target centered in a dark window: the posterior mask
        # should cover the target rect and exclude the background
        patch = np.full((80, 80), 40, np.uint8)
        patch[24:56, 24:56] = 200
        fg, bg = csrt._hists_np(patch, 32, 32)
        m = csrt._mask_np(patch, 32, 32, fg, bg)
        assert m[24:56, 24:56].mean() > 0.95
        assert m[:20, :].sum() == 0 and m[60:, :].sum() == 0

    def test_mask_ignores_background_distractor(self):
        # a same-intensity-as-background stripe inside the window must
        # not enter the mask even within the 1.5×target rect
        patch = np.full((80, 80), 40, np.uint8)
        patch[24:56, 24:56] = 200
        patch[30:50, 10:22] = 45  # background-colored clutter
        fg, bg = csrt._hists_np(patch, 32, 32)
        m = csrt._mask_np(patch, 32, 32, fg, bg)
        assert m[30:50, 10:22].sum() == 0

    def test_mask_fallback_on_no_contrast(self):
        patch = np.full((80, 80), 90, np.uint8)
        fg, bg = csrt._hists_np(patch, 32, 32)
        m = csrt._mask_np(patch, 32, 32, fg, bg)
        # flat image → posterior everywhere ~0.5 → rect fallback
        assert m.sum() == 32 * 32
        assert m[24:56, 24:56].all()

    def test_filter_support_respects_mask(self):
        frames, centers = _scene(n_frames=1)
        cy, cx = centers[0]
        st = csrt.csrt_init(frames[0], (cx - 16, cy - 16, 32, 32))
        wh, ww = st["size"]
        patch, _, _ = __import__(
            "rustcv_tpu.ops.golden", fromlist=["golden"])._mosse_crop(
                frames[0].astype(np.float64), cy, cx, wh, ww)
        m = csrt._mask_np(patch.astype(np.uint8), 32, 32,
                          st["hist_fg"], st["hist_bg"])
        assert np.abs(st["g"] * (1.0 - m)).max() < 1e-12


class TestDeviceTwin:
    def test_matches_oracle_trajectory(self, jax_cpu):
        frames, centers = _scene()
        cy, cx = centers[0]
        bbox = (cx - 16, cy - 16, 32, 32)
        gst = csrt.csrt_init(frames[0], bbox)
        dst = csrt.init(frames[0], bbox)
        for t in range(1, len(frames)):
            gst, gok, gpeak = csrt.csrt_step(gst, frames[t])
            dst, dok, dpeak = csrt.step(dst, frames[t], target=(32, 32))
            assert bool(dok) == gok
            assert np.asarray(dst.center).tolist() == list(gst["center"])
            assert abs(float(dpeak) - gpeak) < 5e-3

    def test_object_api_both_backends(self, jax_cpu):
        frames, centers = _scene()
        cy, cx = centers[0]
        bbox = (cx - 16, cy - 16, 32, 32)
        for backend in ("host", "device"):
            t = csrt.TrackerCSRT(backend=backend)
            t.init(frames[0], bbox)
            for k in range(1, len(frames)):
                ok, (x, y, w, h) = t.update(frames[k])
                assert ok and (w, h) == (32, 32)
                ty, tx = centers[k]
                assert abs((y + h // 2) - ty) <= 1
                assert abs((x + w // 2) - tx) <= 1

    def test_vmap_bank(self, jax_cpu):
        import jax

        f1, c1 = _scene(seed=3)
        f2, c2 = _scene(seed=4, start=(60, 80), vel=(-2, 1))
        s1 = csrt.init(f1[0], (c1[0][1] - 16, c1[0][0] - 16, 32, 32))
        s2 = csrt.init(f2[0], (c2[0][1] - 16, c2[0][0] - 16, 32, 32))
        bank = jax.tree.map(lambda a, b: np.stack([np.asarray(a),
                                                   np.asarray(b)]), s1, s2)
        bank = csrt.CsrtState(*bank)
        vstep = jax.vmap(lambda st, fr: csrt.step(st, fr,
                                                  target=(32, 32)))
        for t in range(1, 5):
            bank, ok, _ = vstep(bank, np.stack([f1[t], f2[t]]))
            assert bool(ok[0]) and bool(ok[1])
        cents = np.asarray(bank.center)
        assert abs(cents[0, 0] - c1[4][0]) <= 1
        assert abs(cents[1, 1] - c2[4][1]) <= 1


class TestClutterAdvantage:
    def test_tracks_through_adjacent_clutter(self):
        """A bright distractor bar enters the search window; the masked
        filter must stay on the target (this is the capability the
        spatial reliability mask buys over plain KCF features)."""
        h, w = 120, 200
        rng = np.random.default_rng(7)
        bg = rng.integers(20, 60, (h, w)).astype(np.uint8)
        tex = rng.integers(120, 255, (32, 32)).astype(np.uint8)
        frames, centers = [], []
        cy, cx = 60, 40
        for t in range(10):
            f = bg.copy()
            # distractor bar fixed near the target's path
            f[30:90, 95:110] = 230
            f[cy - 16:cy + 16, cx - 16:cx + 16] = tex
            frames.append(f)
            centers.append((cy, cx))
            cx += 4
        st = csrt.csrt_init(frames[0], (centers[0][1] - 16,
                                        centers[0][0] - 16, 32, 32))
        for t in range(1, len(frames)):
            st, ok, _ = csrt.csrt_step(st, frames[t])
            assert ok
            assert abs(st["center"][0] - centers[t][0]) <= 2
            assert abs(st["center"][1] - centers[t][1]) <= 2

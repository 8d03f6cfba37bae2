"""MOSSE tracker: follows known motion, device twin matches the float64
golden spec (integer trajectory exact, PSR close), failure semantics."""

import numpy as np
import pytest

from rustcv_tpu.ops import golden
from rustcv_tpu.ops import tracker as trk


def _scene(n_frames=12, size=(120, 160), start=(40, 50), vel=(2, 3),
           seed=3):
    """Textured 32x32 square moving at a constant integer velocity over a
    noisy background. Returns (frames u8 [T,H,W], centers [(cy,cx)])."""
    h, w = size
    rng = np.random.default_rng(seed)
    bg = rng.integers(20, 60, (h, w)).astype(np.uint8)
    tex = rng.integers(120, 255, (32, 32)).astype(np.uint8)
    frames, centers = [], []
    cy, cx = start
    for t in range(n_frames):
        f = bg.copy()
        y0, x0 = cy - 16, cx - 16
        ys, xs = slice(max(y0, 0), min(y0 + 32, h)), slice(max(x0, 0),
                                                           min(x0 + 32, w))
        f[ys, xs] = tex[ys.start - y0:ys.stop - y0, xs.start - x0:xs.stop - x0]
        frames.append(f)
        centers.append((cy, cx))
        cy, cx = cy + vel[0], cx + vel[1]
    return np.stack(frames), centers


class TestGolden:
    def test_tracks_constant_velocity(self):
        frames, centers = _scene()
        cy, cx = centers[0]
        st = golden.mosse_init(frames[0], (cx - 32, cy - 32, 64, 64))
        for t in range(1, len(frames)):
            st, ok, psr = golden.mosse_step(st, frames[t])
            assert ok and psr > 5.7
            ty, tx = centers[t]
            assert abs(st["center"][0] - ty) <= 1
            assert abs(st["center"][1] - tx) <= 1

    def test_reports_failure_when_target_vanishes(self):
        frames, centers = _scene(n_frames=4)
        cy, cx = centers[0]
        st = golden.mosse_init(frames[0], (cx - 32, cy - 32, 64, 64))
        st, ok, _ = golden.mosse_step(st, frames[1])
        assert ok
        blank = np.full_like(frames[0], 37)
        st2, ok2, psr2 = golden.mosse_step(st, blank)
        assert not ok2 and psr2 < 5.7
        assert st2["center"] == st["center"]  # frozen on failure

    def test_clamps_at_frame_edge(self):
        frames, centers = _scene(start=(30, 140), vel=(0, 6), n_frames=6)
        cy, cx = centers[0]
        st = golden.mosse_init(frames[0], (cx - 32, cy - 32, 64, 64))
        for t in range(1, len(frames)):
            st, ok, _ = golden.mosse_step(st, frames[t])
            h, w = st["size"]
            assert st["center"][1] <= frames.shape[2] - w + w // 2


class TestDeviceTwin:
    def test_matches_golden_trajectory(self, jax_cpu):
        frames, centers = _scene()
        cy, cx = centers[0]
        bbox = (cx - 32, cy - 32, 64, 64)
        gst = golden.mosse_init(frames[0], bbox)
        dst = trk.init(frames[0], bbox)
        # init filters agree (f32 plane-form full spectrum vs f64
        # rfft half — for real inputs the first w//2+1 columns match)
        w2 = gst["A"].shape[1]
        dev_a = (np.asarray(dst.a_re) + 1j * np.asarray(dst.a_im))[:, :w2]
        np.testing.assert_allclose(dev_a, gst["A"], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(dst.b)[:, :w2], gst["B"], rtol=2e-3, atol=2e-3)
        for t in range(1, len(frames)):
            gst, gok, gpsr = golden.mosse_step(gst, frames[t])
            dst, dok, dpsr = trk.step(dst, frames[t])
            assert bool(dok) == gok
            assert np.asarray(dst.center).tolist() == list(gst["center"])
            assert abs(float(dpsr) - gpsr) / gpsr < 0.05

    def test_object_api_both_backends(self, jax_cpu):
        frames, centers = _scene()
        cy, cx = centers[0]
        bbox = (cx - 32, cy - 32, 64, 64)
        for backend in ("host", "device"):
            t = trk.TrackerMOSSE(backend=backend)
            t.init(frames[0], bbox)
            for k in range(1, len(frames)):
                ok, (x, y, w, h) = t.update(frames[k])
                assert ok and (w, h) == (64, 64)
                ty, tx = centers[k]
                assert abs((y + h // 2) - ty) <= 1
                assert abs((x + w // 2) - tx) <= 1

    def test_bgr_mat_input(self, jax_cpu):
        from rustcv_tpu.core.mat import Mat

        frames, centers = _scene()
        bgr = np.repeat(frames[..., None], 3, axis=-1)
        cy, cx = centers[0]
        t = trk.TrackerMOSSE()
        t.init(Mat.from_array(bgr[0]), (cx - 32, cy - 32, 64, 64))
        ok, box = t.update(Mat.from_array(bgr[1]))
        assert ok

    def test_vmap_bank(self, jax_cpu):
        """Two same-size trackers advance as one vmapped dispatch."""
        import jax

        f1, c1 = _scene(seed=3)
        f2, c2 = _scene(seed=4, start=(60, 80), vel=(-2, 1))
        s1 = trk.init(f1[0], (c1[0][1] - 32, c1[0][0] - 32, 64, 64))
        s2 = trk.init(f2[0], (c2[0][1] - 32, c2[0][0] - 32, 64, 64))
        bank = jax.tree.map(lambda a, b: np.stack([np.asarray(a),
                                                   np.asarray(b)]), s1, s2)
        bank = trk.MosseState(*bank)
        vstep = jax.vmap(lambda st, fr: trk.step(st, fr))
        for t in range(1, 5):
            bank, ok, psr = vstep(bank, np.stack([f1[t], f2[t]]))
            assert bool(ok[0]) and bool(ok[1])
        cents = np.asarray(bank.center)
        assert abs(cents[0, 0] - c1[4][0]) <= 1
        assert abs(cents[1, 1] - c2[4][1]) <= 1

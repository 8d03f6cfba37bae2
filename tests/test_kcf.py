"""KCF tracker: follows known motion, device twin matches the f64
oracle, failure semantics, object API both backends."""

import numpy as np

from rustcv_tpu.ops import kcf


def _scene(n_frames=12, size=(120, 160), start=(40, 50), vel=(2, 3),
           seed=3):
    h, w = size
    rng = np.random.default_rng(seed)
    bg = rng.integers(20, 60, (h, w)).astype(np.uint8)
    tex = rng.integers(120, 255, (32, 32)).astype(np.uint8)
    frames, centers = [], []
    cy, cx = start
    for _ in range(n_frames):
        f = bg.copy()
        y0, x0 = cy - 16, cx - 16
        ys = slice(max(y0, 0), min(y0 + 32, h))
        xs = slice(max(x0, 0), min(x0 + 32, w))
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
        st = kcf.kcf_init(frames[0], (cx - 16, cy - 16, 32, 32))
        for t in range(1, len(frames)):
            st, ok, peak = kcf.kcf_step(st, frames[t])
            assert ok and peak > 0.5
            assert st["center"] == centers[t]

    def test_reports_failure_when_target_vanishes(self):
        frames, centers = _scene(n_frames=4)
        cy, cx = centers[0]
        st = kcf.kcf_init(frames[0], (cx - 16, cy - 16, 32, 32))
        st, ok, _ = kcf.kcf_step(st, frames[1])
        assert ok
        blank = np.full_like(frames[0], 37)
        st2, ok2, peak2 = kcf.kcf_step(st, blank)
        assert not ok2 and peak2 < kcf.DETECT_THRESH
        assert st2["center"] == st["center"]

    def test_tiny_target_raises(self):
        frames, _ = _scene(n_frames=1)
        try:
            kcf.kcf_init(frames[0], (10, 10, 3, 3))
            assert False
        except ValueError:
            pass


class TestDeviceTwin:
    def test_matches_oracle_trajectory(self, jax_cpu):
        frames, centers = _scene()
        cy, cx = centers[0]
        bbox = (cx - 16, cy - 16, 32, 32)
        gst = kcf.kcf_init(frames[0], bbox)
        dst = kcf.init(frames[0], bbox)
        np.testing.assert_allclose(np.asarray(dst.x), gst["x"],
                                   atol=1e-4)
        for t in range(1, len(frames)):
            gst, gok, gpeak = kcf.kcf_step(gst, frames[t])
            dst, dok, dpeak = kcf.step(dst, frames[t])
            assert bool(dok) == gok
            assert np.asarray(dst.center).tolist() == list(gst["center"])
            assert abs(float(dpeak) - gpeak) < 5e-3

    def test_object_api_both_backends(self, jax_cpu):
        frames, centers = _scene()
        cy, cx = centers[0]
        bbox = (cx - 16, cy - 16, 32, 32)
        for backend in ("host", "device"):
            t = kcf.TrackerKCF(backend=backend)
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
        s1 = kcf.init(f1[0], (c1[0][1] - 16, c1[0][0] - 16, 32, 32))
        s2 = kcf.init(f2[0], (c2[0][1] - 16, c2[0][0] - 16, 32, 32))
        bank = jax.tree.map(lambda a, b: np.stack([np.asarray(a),
                                                   np.asarray(b)]), s1, s2)
        bank = kcf.KcfState(*bank)
        vstep = jax.vmap(lambda st, fr: kcf.step(st, fr))
        for t in range(1, 5):
            bank, ok, _ = vstep(bank, np.stack([f1[t], f2[t]]))
            assert bool(ok[0]) and bool(ok[1])
        cents = np.asarray(bank.center)
        assert abs(cents[0, 0] - c1[4][0]) <= 1
        assert abs(cents[1, 1] - c2[4][1]) <= 1

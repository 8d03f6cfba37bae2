"""Haar cascade: AdaBoost training separates synthetic pattern vs noise,
multi-scale detection localizes planted targets, JSON round-trip,
device scorer matches oracle."""

import numpy as np
import pytest

from rustcv_tpu.ops import cascade
from rustcv_tpu.ops.golden import resize_bilinear

WIN = 24


def _make_pos(n, rng):
    out = []
    for _ in range(n):
        p = rng.integers(90, 130, (WIN, WIN))
        p[4:10, 3:21] = rng.integers(20, 50, (6, 18))
        p[14:22, 6:18] = rng.integers(170, 220, (8, 12))
        out.append(np.clip(p, 0, 255))
    return np.stack(out).astype(np.uint8)


def _make_neg(n, rng):
    return rng.integers(0, 256, (n, WIN, WIN)).astype(np.uint8)


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(0)
    return cascade.train_cascade(_make_pos(60, rng), _make_neg(300, rng),
                                 n_stages=3, n_stumps=8)


class TestTraining:
    def test_holdout_separation(self, model):
        pv = _make_pos(40, np.random.default_rng(1))
        nv = _make_neg(200, np.random.default_rng(1))

        def passes(p):
            ok, _ = cascade.score_windows(p.astype(np.float64), model)
            return bool(ok[0, 0])

        assert np.mean([passes(p) for p in pv]) >= 0.95
        assert np.mean([passes(p) for p in nv]) <= 0.05

    def test_json_roundtrip(self, model):
        c2 = cascade.Cascade.from_json(model.to_json())
        img = _make_pos(1, np.random.default_rng(3))[0]
        ok1, m1 = cascade.score_windows(img, model)
        ok2, m2 = cascade.score_windows(img, c2)
        np.testing.assert_array_equal(ok1, ok2)
        np.testing.assert_array_equal(m1, m2)


class TestDetect:
    def _scene(self, seed=5):
        rng = np.random.default_rng(seed)
        scene = rng.integers(0, 256, (96, 120)).astype(np.uint8)
        target = _make_pos(1, np.random.default_rng(2))[0]
        scene[30:54, 60:84] = target
        return scene

    def test_finds_planted_target(self, model):
        boxes, scores = cascade.detect_multi_scale(self._scene(), model)
        assert len(boxes) >= 1
        hits = [b for b in boxes
                if abs(b[0] - 60) <= 3 and abs(b[1] - 30) <= 3
                and b[2] == WIN]
        assert len(hits) == 1
        assert len(boxes) <= 4  # at most a few stray windows in noise

    def test_finds_scaled_target(self, model):
        rng = np.random.default_rng(7)
        scene = rng.integers(0, 256, (140, 160)).astype(np.uint8)
        target = _make_pos(1, np.random.default_rng(2))[0]
        big = resize_bilinear(target[..., None], 48, 48)[..., 0]
        scene[40:88, 70:118] = big
        boxes, _ = cascade.detect_multi_scale(scene, model)
        hits = [b for b in boxes
                if abs(b[0] + b[2] / 2 - 94) <= 8
                and abs(b[1] + b[3] / 2 - 64) <= 8 and b[2] >= 40]
        assert len(hits) >= 1

    def test_clean_noise_scene(self, model):
        rng = np.random.default_rng(11)
        noise = rng.integers(0, 256, (96, 120)).astype(np.uint8)
        boxes, _ = cascade.detect_multi_scale(noise, model)
        assert len(boxes) <= 3  # essentially nothing

    def test_device_scorer_matches(self, model, jax_cpu):
        img = self._scene()
        g_ok, g_m = cascade.score_windows(img, model)
        d_ok, d_m = cascade.score_windows_device(img, model)
        # f32 integral vs f64: decisions may flip only on exact ties
        assert (g_ok == d_ok).mean() > 0.999
        np.testing.assert_allclose(d_m, g_m, atol=1e-2)

    def test_device_detect_path(self, model, jax_cpu):
        boxes, _ = cascade.detect_multi_scale(self._scene(), model,
                                              use_device=True)
        hits = [b for b in boxes
                if abs(b[0] - 60) <= 3 and abs(b[1] - 30) <= 3]
        assert len(hits) == 1

"""utils/trace coverage: StageTimer, CaptureStats semantics."""

import time

import numpy as np

from rustcv_tpu.utils import CaptureStats, StageTimer, get_logger


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            pass
        t.add("b", 0.5)
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_ms"] >= 10
        assert s["b"]["avg_ms"] == 500.0
        t.reset()
        assert t.summary() == {}


class TestCaptureStats:
    def test_drop_accounting(self):
        cs = CaptureStats()
        t = 100.0
        for seq in (0, 1, 2, 5, 6):  # gap 3-4 = 2 drops
            cs.record(seq, t)
            t += 0.01
        r = cs.report()
        assert r["frames"] == 5
        assert r["dropped"] == 2
        assert abs(r["fps"] - 100.0) < 1
        assert cs.drop_rate == 2 / 7

    def test_intervals(self):
        cs = CaptureStats()
        for i, dt in enumerate([0.0, 0.01, 0.01, 0.05]):
            cs.record(i, 10.0 + sum([0.0, 0.01, 0.02, 0.07][: i + 1]))
        assert cs.max_interval_ms >= 40

    def test_empty(self):
        cs = CaptureStats()
        assert cs.fps == 0.0 and cs.dropped == 0 and cs.p99_interval_ms == 0.0


def test_logger_namespace():
    assert get_logger().name == "rustcv_tpu"

"""Native C++ layer tests: build, bit-exact parity with the frozen Python
specs, and the ring's DQBUF-style semantics."""

import time

import numpy as np
import pytest

from rustcv_tpu import native
from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.core import PixelFormat, ResolvedConfig
from rustcv_tpu.ops import golden

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.build_error()}"
)


class TestNativeParity:
    @pytest.mark.parametrize("w,h,seq", [(64, 48, 0), (160, 120, 7), (130, 54, 999)])
    def test_synth_bgr(self, w, h, seq):
        np.testing.assert_array_equal(native.synth_bgr(w, h, seq), sim.synth_bgr(w, h, seq))

    @pytest.mark.parametrize("w,h,seq", [(64, 48, 0), (160, 120, 42)])
    def test_synth_yuyv(self, w, h, seq):
        want = sim.synth_raw(w, h, PixelFormat.YUYV, seq)
        np.testing.assert_array_equal(native.synth_yuyv(w, h, seq), want)

    def test_yuyv_to_bgr(self, rng):
        src = rng.integers(0, 256, 64 * 48 * 2, dtype=np.uint8)
        want = golden.yuyv_to_bgr(src, 64, 48)
        np.testing.assert_array_equal(native.yuyv_to_bgr(src, 64, 48), want)


class TestNativeRing:
    def test_free_run_sequenced(self):
        ring = native.NativeRing(4, 64, 48)
        ring.start(fps=1000, paced=False)
        try:
            seqs = []
            for _ in range(5):
                res = ring.dequeue()
                assert res is not None
                slot, view, seq, ts = res
                seqs.append(seq)
                # frame content matches the frozen spec for its seq
                np.testing.assert_array_equal(
                    view, sim.synth_raw(64, 48, PixelFormat.YUYV, seq)
                )
                ring.requeue(slot)
            assert seqs == sorted(seqs)
        finally:
            ring.stop()
            ring.close()

    def test_drops_when_consumer_stalls(self):
        ring = native.NativeRing(2, 64, 48)
        ring.start(fps=500, paced=True)
        try:
            res = ring.dequeue()
            assert res is not None
            time.sleep(0.1)  # hold the slot; ring has 1 free slot for ~50 frames
            assert ring.dropped > 0
        finally:
            ring.stop()
            ring.close()


class TestNativeSource:
    def test_frame_source_contract(self):
        from rustcv_tpu.capture.native_source import NativeSimulationSource

        src = NativeSimulationSource(
            ResolvedConfig(64, 48, 120, PixelFormat.YUYV, 4), paced=False
        )
        src.start()
        try:
            f0 = src.next_frame()
            s0 = f0.sequence
            np.testing.assert_array_equal(
                f0.data, sim.synth_raw(64, 48, PixelFormat.YUYV, s0)
            )
            owned = f0.to_owned()
            f1 = src.next_frame()
            assert f1.sequence > s0
            with pytest.raises(RuntimeError):
                _ = f0.data  # slot requeued → view invalid
            _ = owned.data
            assert src.telemetry().link_throughput_mbps > 0
        finally:
            src.close()

"""Mutational fuzz of the AVI reader (pure-Python parser of untrusted
bytes): generate a valid MJPEG-AVI with the in-repo writer, then replay
seeded mutations for a time budget. The reader may raise clean Python
exceptions (ValueError/KeyError/IndexError/struct.error/OSError) on garbage
— what it must never do is hang, recurse forever, or allocate absurdly
(a byte-length field must never be trusted before a bounds check).

Run via ``make fuzz`` (after the C++ harness) or directly:
``python tests/fuzz/fuzz_avi.py [seconds]``.
"""

import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_seed(path: str) -> bytes:
    from rustcv_tpu.capture.avi import VideoWriter
    from rustcv_tpu.capture.simulation import encode_mjpeg, synth_bgr

    with VideoWriter(path, fps=10, frame_size=(64, 48)) as w:
        for s in range(3):
            w.write_encoded(bytes(encode_mjpeg(synth_bgr(64, 48, s), quality=70)))
    with open(path, "rb") as f:
        return f.read()


def run_one(path: str) -> None:
    from rustcv_tpu.capture.avi import AviMjpegReader
    from rustcv_tpu.core.errors import CameraError

    try:
        r = AviMjpegReader(path)
        for i in range(min(len(r), 8)):
            r.frame_bytes(i)
    except (CameraError, ValueError, KeyError, IndexError, OSError, EOFError) as e:
        _ = e  # clean rejection is the contract (incl. the repo's taxonomy)
    except MemoryError:
        raise AssertionError("untrusted length field drove an allocation")


def main(budget: float) -> None:
    # Backstop: a parser that trusts a length field will hit this rlimit
    # (and fail the run) instead of taking the host down.
    resource.setrlimit(resource.RLIMIT_AS, (2 << 30, 2 << 30))
    rng = np.random.default_rng(0x5EED)
    with tempfile.TemporaryDirectory() as td:
        seed_path = os.path.join(td, "seed.avi")
        seed = bytearray(build_seed(seed_path))
        run_one(seed_path)  # unmutated regression pass
        mut_path = os.path.join(td, "mut.avi")
        t0 = time.perf_counter()
        iters = 0
        while time.perf_counter() - t0 < budget:
            buf = bytearray(seed)
            for _ in range(int(rng.integers(1, 9))):
                kind = int(rng.integers(0, 10))
                if kind == 0 and len(buf) > 1:
                    del buf[int(rng.integers(1, len(buf))):]
                elif kind == 1:
                    buf.extend(rng.integers(0, 256, int(rng.integers(1, 64)), dtype=np.uint8).tobytes())
                elif kind == 2 and len(buf) >= 4:  # stomp a dword (sizes/counts)
                    p = int(rng.integers(0, len(buf) - 3))
                    buf[p:p + 4] = rng.integers(0, 256, 4, dtype=np.uint8).tobytes()
                elif len(buf) > 0:
                    p = int(rng.integers(0, len(buf)))
                    buf[p] = int(rng.integers(0, 256))
            with open(mut_path, "wb") as f:
                f.write(buf)
            t_one = time.perf_counter()
            run_one(mut_path)
            if time.perf_counter() - t_one > 5.0:
                raise AssertionError("parser took >5s on a mutated file (hang?)")
            iters += 1
    print(f"fuzz_avi: {iters} mutated runs, clean")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 30.0)

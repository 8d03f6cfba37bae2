"""Pallas Harris-response kernel parity (tolerance: float32 windowing)."""

import numpy as np
import pytest

from rustcv_tpu.ops import golden


class TestHarrisPallas:
    @pytest.mark.parametrize(
        "shape,tile", [((2, 48, 64), 16), ((1, 100, 130), 32),
                       ((1, 135, 256), 128), ((1, 6, 128), 64)],
    )
    def test_response_parity(self, rng, jax_cpu, shape, tile):
        from rustcv_tpu.ops.pallas.harris import harris_response_pallas

        g = rng.integers(0, 256, shape, dtype=np.uint8)
        want = np.stack([golden.harris_response(x) for x in g])
        got = np.asarray(harris_response_pallas(jax_cpu.numpy.asarray(g), tile_rows=tile))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)

    def test_corner_positions_match(self, jax_cpu):
        from rustcv_tpu.ops.pallas.harris import harris_response_pallas

        ys, xs = np.mgrid[0:64, 0:64]
        board = (((ys // 8) + (xs // 8)) % 2 * 255).astype(np.uint8)
        resp = np.asarray(harris_response_pallas(jax_cpu.numpy.asarray(board)))
        want_mask = golden.harris_corners(board)
        # NMS+threshold on the pallas response reproduces the corner set
        thresh = 0.01 * resp.max()
        p = np.pad(resp, 1, constant_values=-np.inf)
        local_max = np.ones_like(resp, bool)
        for dy in range(3):
            for dx in range(3):
                if (dy, dx) != (1, 1):
                    local_max &= resp >= p[dy : dy + 64, dx : dx + 64]
        got_mask = (resp > thresh) & local_max
        diff = np.logical_xor(got_mask, want_mask).sum()
        assert diff <= max(2, int(0.02 * want_mask.sum()))

"""Pyramidal Lucas–Kanade: recovers known sub-pixel motion, device matches
the float64 oracle, status semantics, and the tracking facade."""

import numpy as np
import pytest

from rustcv_tpu.capture import simulation as sim
from rustcv_tpu.ops import golden, warp
from rustcv_tpu.ops import optflow as of


@pytest.fixture()
def pair():
    """Textured frame + a (3.4, −2.2) px translated copy. Uses a LOCAL
    fixed-seed generator (not the session ``rng``) so the noise — and the
    marginal corner-trackability assertion downstream — does not depend on
    which tests ran earlier in the session."""
    local = np.random.default_rng(7)
    prev = golden.bgr_to_gray(sim.synth_bgr(160, 120, 3))
    prev = np.clip(
        prev.astype(np.int32) + local.integers(0, 20, prev.shape), 0, 255
    ).astype(np.uint8)
    m = np.array([[1.0, 0.0, 3.4], [0.0, 1.0, -2.2]])
    nxt = warp.warp_affine_numpy(prev, m, (160, 120), border="replicate")
    return prev, nxt, np.array([3.4, -2.2])


GOOD_PTS = np.array([[40.0, 60.0], [80.0, 40.0], [60.0, 70.0]], np.float32)


class TestLK:
    def test_recovers_translation(self, jax_cpu, pair):
        prev, nxt, true_flow = pair
        np_pts, st = of.calc_optical_flow_pyr_lk(prev, nxt, GOOD_PTS, win=21, levels=2)
        np_pts, st = np.asarray(np_pts), np.asarray(st)
        assert st.all()
        flow = np_pts - GOOD_PTS
        assert np.all(np.abs(flow - true_flow) < 0.1)  # sub-pixel

    def test_device_matches_oracle(self, jax_cpu, pair):
        prev, nxt, _ = pair
        d_pts, d_st = of.calc_optical_flow_pyr_lk(prev, nxt, GOOD_PTS, win=15, levels=2)
        o_pts, o_st = of.calc_optical_flow_pyr_lk_numpy(prev, nxt, GOOD_PTS, win=15, levels=2)
        assert np.array_equal(np.asarray(d_st), o_st)
        assert np.abs(np.asarray(d_pts) - o_pts).max() < 1e-3

    def test_status_rejects_border_and_flat(self, jax_cpu, pair):
        prev, nxt, _ = pair
        pts = np.array(
            [[3.0, 3.0],      # window leaves the image at fine levels
             [40.0, 60.0]],   # good
            np.float32,
        )
        _, st = of.calc_optical_flow_pyr_lk(prev, nxt, pts, win=21, levels=2)
        st = np.asarray(st)
        assert not st[0] and st[1]
        # flat (textureless) image: everything rejected by the G threshold
        flat = np.full((120, 160), 100, np.uint8)
        _, st2 = of.calc_optical_flow_pyr_lk(flat, flat, GOOD_PTS, win=21, levels=1)
        assert not np.asarray(st2).any()

    def test_large_motion_needs_pyramid(self, jax_cpu, rng):
        """A 14-px shift: a single level (win 21) diverges or is
        inaccurate; 3 levels lock on."""
        prev = golden.bgr_to_gray(sim.synth_bgr(200, 160, 9))
        prev = np.clip(
            prev.astype(np.int32) + rng.integers(0, 25, prev.shape), 0, 255
        ).astype(np.uint8)
        m = np.array([[1.0, 0.0, 14.0], [0.0, 1.0, 0.0]])
        nxt = warp.warp_affine_numpy(prev, m, (200, 160), border="replicate")
        pts = np.array([[100.0, 80.0], [60.0, 100.0]], np.float32)
        np_pts, st = of.calc_optical_flow_pyr_lk(prev, nxt, pts, win=21, levels=3)
        flow = np.asarray(np_pts) - pts
        assert np.asarray(st).all()
        assert np.all(np.abs(flow[:, 0] - 14.0) < 0.3)
        assert np.all(np.abs(flow[:, 1]) < 0.3)

    def test_tiny_image_raises(self, jax_cpu):
        tiny = np.zeros((20, 20), np.uint8)
        with pytest.raises(ValueError):
            of.calc_optical_flow_pyr_lk(tiny, tiny, np.zeros((1, 2), np.float32), win=21)
        with pytest.raises(ValueError):
            of.calc_optical_flow_pyr_lk_numpy(tiny, tiny, np.zeros((1, 2), np.float32), win=21)

    def test_facade_with_corner_seeds(self, jax_cpu, pair):
        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        prev, nxt, true_flow = pair
        mp = Mat.from_array(prev)
        pts = imgproc.good_features_to_track(mp, max_corners=32)
        assert pts.shape[1] == 2 and len(pts) > 4
        np_pts, st = imgproc.calc_optical_flow_pyr_lk(
            mp, Mat.from_array(nxt), pts, win=21, levels=2
        )
        good = st & (np.abs((np_pts - pts) - true_flow) < 0.5).all(axis=1)
        assert good.mean() > 0.6  # most corners track the global motion
        # device path agrees with host
        import jax.numpy as jnp

        d_pts, d_st = imgproc.calc_optical_flow_pyr_lk(
            Mat.from_device(jnp.asarray(prev)), Mat.from_device(jnp.asarray(nxt)),
            pts, win=21, levels=2,
        )
        assert np.array_equal(d_st, st)
        assert np.abs(d_pts - np_pts).max() < 1e-2

"""ORB orientation + steered BRIEF — oracle parity and the property the
steering exists for: descriptors survive in-plane rotation (upright BRIEF
does not)."""

import numpy as np
import pytest

from rustcv_tpu.ops import brief, golden


def _tex(rng, h, w):
    a = rng.integers(0, 256, (h, w), np.uint8)
    for _ in range(2):
        a = golden.gaussian5_u8(a)
    return a


@pytest.fixture
def scene(jax_cpu):
    rng = np.random.default_rng(42)
    img = _tex(rng, 160, 200)
    pts = np.stack([
        rng.uniform(30, 170, 40), rng.uniform(30, 130, 40),
    ], axis=-1).astype(np.float32)  # (x, y)
    return img, pts


class TestOrientation:
    def test_matches_oracle(self, scene):
        img, pts = scene
        dev = np.asarray(brief.orb_orientations(img, pts))
        ora = brief.orb_orientations_numpy(img, pts)
        d = np.abs(dev - ora)
        d = np.minimum(d, 2 * np.pi - d)  # circular
        assert d.max() < 1e-3

    def test_gradient_direction(self, jax_cpu):
        """A pure horizontal ramp has its centroid toward +x → angle ~ 0;
        flipped ramp → angle ~ pi."""
        ramp = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
        pts = np.array([[32.0, 32.0]], np.float32)
        a1 = float(np.asarray(brief.orb_orientations(ramp, pts))[0])
        a2 = float(np.asarray(brief.orb_orientations(ramp[:, ::-1].copy(), pts))[0])
        assert abs(a1) < 0.05 or abs(a1 - 2 * np.pi) < 0.05
        assert abs(a2 - np.pi) < 0.05

    def test_rotation_shifts_angle(self, jax_cpu):
        """Rotating the image by 90 deg rotates the measured angle by 90."""
        rng = np.random.default_rng(5)
        img = _tex(rng, 101, 101)
        rot = np.ascontiguousarray(np.rot90(img))  # +90 deg CCW in image coords
        c = 50.0
        a0 = brief.orb_orientations_numpy(img, np.array([[c, c]]))[0]
        a1 = brief.orb_orientations_numpy(rot, np.array([[c, c]]))[0]
        d = (a1 - a0) % (2 * np.pi)
        # y-down coords: rot90 of the array is a -90 deg image rotation
        assert min(abs(d - 3 * np.pi / 2), abs(d - np.pi / 2)) < 0.2


class TestSteeredBrief:
    def test_matches_oracle(self, scene):
        img, pts = scene
        ang = brief.orb_orientations_numpy(img, pts)
        dev_d, dev_v = brief.orb_descriptors(img, pts, ang.astype(np.float32))
        ora_d, ora_v = brief.orb_descriptors_numpy(img, pts, ang)
        assert np.array_equal(np.asarray(dev_v), ora_v)
        assert np.array_equal(np.asarray(dev_d), ora_d)

    def test_zero_angle_equals_upright(self, scene):
        img, pts = scene
        z = np.zeros(len(pts), np.float32)
        d_st, v_st = brief.orb_descriptors(img, pts, z)
        d_up, v_up = brief.brief_descriptors(img, pts)
        assert np.array_equal(np.asarray(v_st), np.asarray(v_up))
        assert np.array_equal(np.asarray(d_st), np.asarray(d_up))

    def test_survives_rotation_where_upright_fails(self, jax_cpu):
        """The point of ORB: after a 45 deg in-plane rotation, steered
        descriptors still match across the pair; upright ones mostly
        don't."""
        rng = np.random.default_rng(9)
        big = _tex(rng, 257, 257)
        th = np.pi / 4
        c = 128.0
        yy, xx = np.mgrid[0:257, 0:257].astype(np.float64)
        sx = c + np.cos(th) * (xx - c) + np.sin(th) * (yy - c)
        sy = c - np.sin(th) * (xx - c) + np.cos(th) * (yy - c)
        x0 = np.clip(np.floor(sx).astype(int), 0, 255)
        y0 = np.clip(np.floor(sy).astype(int), 0, 255)
        ax, ay = np.clip(sx - x0, 0, 1), np.clip(sy - y0, 0, 1)
        rot = np.round(
            big[y0, x0] * (1 - ax) * (1 - ay) + big[y0, x0 + 1] * ax * (1 - ay)
            + big[y0 + 1, x0] * (1 - ax) * ay + big[y0 + 1, x0 + 1] * ax * ay
        ).astype(np.uint8)
        # sample keypoints well inside; map through the rotation
        pts1 = np.stack([rng.uniform(70, 186, 64), rng.uniform(70, 186, 64)],
                        axis=-1).astype(np.float32)
        dx, dy = pts1[:, 0] - c, pts1[:, 1] - c
        pts2 = np.stack([
            c + np.cos(th) * dx - np.sin(th) * dy,
            c + np.sin(th) * dx + np.cos(th) * dy,
        ], axis=-1).astype(np.float32)
        a1 = np.asarray(brief.orb_orientations(big, pts1))
        a2 = np.asarray(brief.orb_orientations(rot, pts2))
        d1, v1 = brief.orb_descriptors(big, pts1, a1)
        d2, v2 = brief.orb_descriptors(rot, pts2, a2)
        m_steered = brief.match_descriptors(d1, d2, np.asarray(v1), np.asarray(v2))
        u1, w1 = brief.brief_descriptors(big, pts1)
        u2, w2 = brief.brief_descriptors(rot, pts2)
        m_up = brief.match_descriptors(u1, u2, np.asarray(w1), np.asarray(w2))
        correct_st = np.sum(m_steered[:, 0] == m_steered[:, 1]) if len(m_steered) else 0
        correct_up = np.sum(m_up[:, 0] == m_up[:, 1]) if len(m_up) else 0
        assert correct_st >= 32, f"steered matched only {correct_st}"
        assert correct_st >= correct_up + 10


class TestFacade:
    def test_device_and_host_agree(self, jax_cpu):
        import jax.numpy as jnp

        from rustcv_tpu import imgproc
        from rustcv_tpu.core.mat import Mat

        rng = np.random.default_rng(21)
        img = _tex(rng, 120, 160)
        img[40:44, 60:64] = 255  # guaranteed corners
        p_d, a_d, d_d, v_d = imgproc.orb_features(
            Mat.from_device(jnp.asarray(img)), max_keypoints=64)
        p_h, a_h, d_h, v_h = imgproc.orb_features(
            Mat.from_array(img), max_keypoints=64)
        assert v_d.sum() > 0 and v_h.sum() > 0
        # same keypoint set (order may differ): compare as sets of tuples
        s_d = {tuple(p) for p, v in zip(p_d.astype(int), v_d) if v}
        s_h = {tuple(p) for p, v in zip(p_h.astype(int), v_h) if v}
        assert s_d == s_h
        # descriptors agree at the shared keypoints
        map_h = {tuple(p): tuple(d) for p, d, v in zip(p_h.astype(int), d_h, v_h) if v}
        for p, d, v in zip(p_d.astype(int), d_d, v_d):
            if v and tuple(p) in map_h:
                assert tuple(d) == map_h[tuple(p)]

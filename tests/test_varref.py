"""VariationalRefinement: EPE improvement on ground-truth scenes,
device twin vs oracle, comparison vs cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustcv_tpu.ops import varref

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(1234)
    # textured scene translated by (1.5, -1.0) px with subpixel warp
    base = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (5, 5), 1.5)
    m = np.float32([[1, 0, 1.5], [0, 1, -1.0]])
    i1 = cv2.warpAffine(base, m, (90, 70))
    # I1(x) = I0(x − (1.5, −1)); with the I1(x+u) = I0(x) convention
    # the true flow is (+1.5, −1.0) — verified photometrically
    true_flow = np.zeros((70, 90, 2), np.float32)
    true_flow[..., 0] = 1.5
    true_flow[..., 1] = -1.0
    return base, i1, true_flow


def _epe(flow, true_flow, margin=6):
    d = flow[margin:-margin, margin:-margin] \
        - true_flow[margin:-margin, margin:-margin]
    return float(np.sqrt((d ** 2).sum(-1)).mean())


def test_refines_noisy_flow(pair, rng):
    i0, i1, tf = pair
    noisy = tf + rng.normal(0, 0.4, tf.shape).astype(np.float32)
    before = _epe(noisy, tf)
    out = varref.variational_refine_numpy(i0, i1, noisy)
    after = _epe(out, tf)
    assert after < 0.4 * before, (before, after)


def test_device_matches_oracle(pair, rng, jax_cpu):
    i0, i1, tf = pair
    noisy = tf + rng.normal(0, 0.3, tf.shape).astype(np.float32)
    ours = varref.variational_refine_numpy(i0, i1, noisy)
    dev = np.asarray(varref.variational_refine(
        jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(noisy)))
    d = np.abs(dev - ours)[4:-4, 4:-4]
    assert d.max() < 2e-2, d.max()  # f32 SOR drift


def test_vs_cv2(pair, rng):
    i0, i1, tf = pair
    noisy = tf + rng.normal(0, 0.4, tf.shape).astype(np.float32)
    ours = varref.variational_refine_numpy(i0, i1, noisy)
    vr = cv2.VariationalRefinement.create()
    ref = noisy.copy()
    vr.calc(i0, i1, ref)
    ours_epe = _epe(ours, tf)
    ref_epe = _epe(ref, tf)
    # within 1.5× of cv2's refinement quality on the same inputs
    assert ours_epe <= 1.5 * ref_epe + 0.02, (ours_epe, ref_epe)


def test_zero_flow_stays_reasonable(pair):
    i0, _, _ = pair
    z = np.zeros((70, 90, 2), np.float32)
    out = varref.variational_refine_numpy(i0, i0, z)
    assert np.abs(out).max() < 0.1  # identical frames → no motion


def test_dis_facade_refine(pair, rng):
    import rustcv_tpu.imgproc as ip
    from rustcv_tpu.core.mat import Mat

    i0, i1, tf = pair
    flow = ip.calc_optical_flow_dis(Mat.from_array(i0),
                                    Mat.from_array(i1), refine=True)
    assert flow.shape == tf.shape and flow.dtype == np.float32
    assert _epe(flow, tf) < 0.5


def test_dis_presets(pair):
    import rustcv_tpu.imgproc as ip
    from rustcv_tpu.core.mat import Mat

    i0, i1, tf = pair
    # the coarse presets run their finest level at 1/4 resolution —
    # accuracy on this small 70x90 frame is accordingly loose
    for preset, bound in (("ultrafast", 4.0), ("fast", 4.0),
                          ("medium", 0.8)):
        flow = ip.calc_optical_flow_dis(Mat.from_array(i0),
                                        Mat.from_array(i1),
                                        preset=preset)
        assert flow.shape == tf.shape
        assert np.isfinite(flow).all()
        assert _epe(flow, tf) < bound, preset

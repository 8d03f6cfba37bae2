"""Kalman filter: OpenCV-role object API vs the frozen float64 golden
spec, batched device updates, and the one-program lax.scan filter pass.

The reference has no Kalman (OpenCV-parity addition); golden.kalman_* is
the frozen spec. Device math is float32 — documented tolerance rtol 1e-4
on conditioned models per the fidelity contract.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from rustcv_tpu.ops import golden
from rustcv_tpu.ops.kalman import (
    KalmanFilter, predict_batch, correct_batch, filter_scan,
)


def _cv_model(dt=1.0, q=1e-2, r=0.5):
    """Constant-velocity 1-D model: state (pos, vel), measure pos."""
    A = np.array([[1.0, dt], [0.0, 1.0]])
    H = np.array([[1.0, 0.0]])
    Q = q * np.array([[dt ** 3 / 3, dt ** 2 / 2], [dt ** 2 / 2, dt]])
    R = np.array([[r]])
    return A, H, Q, R


def _simulate(T, rng, dt=1.0, r=0.5):
    pos = np.cumsum(np.full(T, 0.7 * dt)) + 3.0
    zs = pos + rng.normal(0, np.sqrt(r), T)
    return pos, zs[:, None]


class TestKalmanObject:
    def test_predict_correct_matches_golden(self, rng):
        A, H, Q, R = _cv_model()
        kf = KalmanFilter(2, 1)
        kf.transition_matrix = A
        kf.measurement_matrix = H
        kf.process_noise_cov = Q
        kf.measurement_noise_cov = R
        kf.state_post = np.array([0.0, 0.0])
        kf.error_cov_post = np.eye(2)

        x, P = kf.state_post.copy(), kf.error_cov_post.copy()
        for t in range(5):
            z = np.array([float(t) + rng.normal()])
            xp = kf.predict()
            gx, gP = golden.kalman_predict(x, P, A, Q)
            np.testing.assert_allclose(xp, gx, rtol=1e-12)
            np.testing.assert_allclose(kf.error_cov_pre, gP, rtol=1e-12)
            xc = kf.correct(z)
            gxc, gPc, gK = golden.kalman_correct(gx, gP, z, H, R)
            np.testing.assert_allclose(xc, gxc, rtol=1e-12)
            np.testing.assert_allclose(kf.error_cov_post, gPc, rtol=1e-12)
            np.testing.assert_allclose(kf.gain, gK, rtol=1e-12)
            x, P = gxc, gPc

    def test_repeated_predict_extrapolates(self):
        # OpenCV copies pre→post inside predict: two predicts move 2 steps.
        A, H, Q, R = _cv_model()
        kf = KalmanFilter(2, 1)
        kf.transition_matrix = A
        kf.process_noise_cov = Q
        kf.state_post = np.array([0.0, 1.0])
        kf.error_cov_post = np.eye(2)
        kf.predict()
        x2 = kf.predict()
        assert x2[0] == pytest.approx(2.0)

    def test_control_input(self):
        kf = KalmanFilter(2, 1, control_params=1)
        kf.control_matrix = np.array([[0.5], [1.0]])
        kf.state_post = np.zeros(2)
        x = kf.predict(control=np.array([2.0]))
        np.testing.assert_allclose(x, [1.0, 2.0])

    def test_tracks_constant_velocity(self, rng):
        A, H, Q, R = _cv_model()
        kf = KalmanFilter(2, 1)
        kf.transition_matrix = A
        kf.measurement_matrix = H
        kf.process_noise_cov = Q
        kf.measurement_noise_cov = R
        kf.state_post = np.array([3.0, 0.0])
        kf.error_cov_post = np.eye(2)
        pos, zs = _simulate(60, rng)
        for z in zs:
            kf.predict()
            kf.correct(z)
        assert abs(kf.state_post[0] - pos[-1]) < 1.0
        assert abs(kf.state_post[1] - 0.7) < 0.2

    def test_bad_dims_raise(self):
        with pytest.raises(ValueError):
            KalmanFilter(0, 1)


class TestKalmanBatched:
    def test_batch_matches_golden_per_tracker(self, rng, jax_cpu):
        A, H, Q, R = _cv_model()
        N = 7
        x = rng.normal(size=(N, 2))
        P = np.stack([np.eye(2) * (1 + 0.1 * i) for i in range(N)])
        z = rng.normal(size=(N, 1))

        xp, Pp = predict_batch(jnp.asarray(x), jnp.asarray(P),
                               jnp.asarray(A), jnp.asarray(Q))
        xn, Pn, K = correct_batch(xp, Pp, jnp.asarray(z),
                                  jnp.asarray(H), jnp.asarray(R))
        for i in range(N):
            gx, gP = golden.kalman_predict(x[i], P[i], A, Q)
            np.testing.assert_allclose(np.asarray(xp)[i], gx,
                                       rtol=1e-4, atol=1e-5)
            gxc, gPc, gK = golden.kalman_correct(gx, gP, z[i], H, R)
            np.testing.assert_allclose(np.asarray(xn)[i], gxc,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(Pn)[i], gPc,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(K)[i], gK,
                                       rtol=1e-4, atol=1e-5)

    def test_per_tracker_model_matrices(self, rng, jax_cpu):
        # A/Q may be batched (N, S, S) for heterogeneous tracker banks.
        N = 3
        A = np.stack([np.eye(2) * (1 + 0.1 * i) for i in range(N)])
        Q = np.stack([np.eye(2) * 0.01] * N)
        x = rng.normal(size=(N, 2))
        P = np.stack([np.eye(2)] * N)
        xp, Pp = predict_batch(jnp.asarray(x), jnp.asarray(P),
                               jnp.asarray(A), jnp.asarray(Q))
        for i in range(N):
            gx, gP = golden.kalman_predict(x[i], P[i], A[i], Q[i])
            np.testing.assert_allclose(np.asarray(xp)[i], gx,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(Pp)[i], gP,
                                       rtol=1e-4, atol=1e-5)


class TestKalmanScan:
    def test_scan_equals_stepwise(self, rng, jax_cpu):
        A, H, Q, R = _cv_model()
        T, N = 12, 4
        x0 = rng.normal(size=(N, 2)).astype(np.float32)
        P0 = np.stack([np.eye(2, dtype=np.float32)] * N)
        zs = rng.normal(size=(T, N, 1)).astype(np.float32)

        xs, xf, Pf = filter_scan(jnp.asarray(x0), jnp.asarray(P0),
                                 jnp.asarray(zs), jnp.asarray(A),
                                 jnp.asarray(H), jnp.asarray(Q),
                                 jnp.asarray(R))
        # step the batch ops manually
        x, P = jnp.asarray(x0), jnp.asarray(P0)
        for t in range(T):
            xp, Pp = predict_batch(x, P, jnp.asarray(A), jnp.asarray(Q))
            x, P, _ = correct_batch(xp, Pp, jnp.asarray(zs[t]),
                                    jnp.asarray(H), jnp.asarray(R))
            np.testing.assert_allclose(np.asarray(xs)[t], np.asarray(x),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xf), np.asarray(x),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Pf), np.asarray(P),
                                   rtol=1e-5, atol=1e-6)

    def test_scan_tracks(self, rng, jax_cpu):
        A, H, Q, R = _cv_model()
        pos, zs = _simulate(60, rng)
        xs, xf, _ = filter_scan(
            jnp.asarray(np.array([[3.0, 0.0]], np.float32)),
            jnp.asarray(np.eye(2, dtype=np.float32)[None]),
            jnp.asarray(zs[:, None, :].astype(np.float32)),
            jnp.asarray(A), jnp.asarray(H), jnp.asarray(Q), jnp.asarray(R))
        assert abs(float(xf[0, 0]) - pos[-1]) < 1.0

"""Kalman-family filter tests (parity model: ref estimate_satellite3D.cpp
Monte-Carlo validation — simulation as oracle + statistical checks)."""
import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.ctrl import kalman, ukf, invariant, belief, lqg, systems
from reak_tpu.ctrl.belief import GaussianBelief
from reak_tpu.math import rotations as rot


def _lin_sys(dt=0.1):
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.5 * dt * dt], [dt]])
    C = jnp.array([[1.0, 0.0]])
    return A, B, C


def _simulate(rng, A, B, C, Q, R, x0, T):
    n = A.shape[0]
    xs, zs = [], []
    x = np.asarray(x0)
    for _ in range(T):
        x = np.asarray(A) @ x + rng.multivariate_normal(np.zeros(n), np.asarray(Q))
        z = np.asarray(C) @ x + rng.multivariate_normal(
            np.zeros(C.shape[0]), np.asarray(R)
        )
        xs.append(x)
        zs.append(z)
    return np.stack(xs), np.stack(zs)


def test_ekf_linear_matches_kalman(rng):
    """On a linear system the EKF is exact; compare to hand-written KF update."""
    A, B, C = _lin_sys()
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    F = systems.lti_discrete(A, B)
    h = lambda x, t=0.0: C @ x
    b = GaussianBelief(jnp.array([0.0, 0.0]), jnp.eye(2))
    u = jnp.zeros(1)
    z = jnp.array([0.7])
    b1 = kalman.ekf_step(F, h, b, u, z, Q, R)
    # manual KF
    P = np.asarray(A @ b.cov @ A.T + Q)
    x = np.asarray(A) @ np.asarray(b.mean)
    S = np.asarray(C) @ P @ np.asarray(C).T + np.asarray(R)
    K = P @ np.asarray(C).T @ np.linalg.inv(S)
    x1 = x + K @ (np.asarray(z) - np.asarray(C) @ x)
    P1 = (np.eye(2) - K @ np.asarray(C)) @ P
    np.testing.assert_allclose(b1.mean, x1, atol=1e-10)
    np.testing.assert_allclose(b1.cov, P1, atol=1e-10)


def test_ekf_tracks_trajectory(rng):
    A, B, C = _lin_sys()
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 1e-2
    xs, zs = _simulate(rng, A, None, C, Q, R, np.array([1.0, 0.0]), 200)
    F = systems.lti_discrete(A, jnp.zeros((2, 1)))
    h = lambda x, t=0.0: C @ x
    b0 = GaussianBelief(jnp.zeros(2), jnp.eye(2))
    us = jnp.zeros((200, 1))
    step = lambda b, u, z: kalman.ekf_step(F, h, b, u, z, Q, R)
    bs = kalman.filter_trajectory(step, b0, us, jnp.asarray(zs))
    err = np.asarray(bs.mean)[50:] - xs[50:]
    assert np.sqrt((err**2).mean()) < 0.05


def test_ukf_linear_matches_ekf(rng):
    A, B, C = _lin_sys()
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    F = systems.lti_discrete(A, B)
    h = lambda x, t=0.0: C @ x
    b = GaussianBelief(jnp.array([0.3, -0.2]), jnp.eye(2) * 0.5)
    u, z = jnp.zeros(1), jnp.array([0.4])
    b_ekf = kalman.ekf_step(F, h, b, u, z, Q, R)
    b_ukf = ukf.ukf_step(F, h, b, u, z, Q, R)
    np.testing.assert_allclose(b_ukf.mean, b_ekf.mean, atol=1e-8)
    np.testing.assert_allclose(b_ukf.cov, b_ekf.cov, atol=1e-8)


def test_ukf_nonlinear_consistency(rng):
    """UKF on a nonlinear range measurement stays consistent (NEES in range)."""
    dt = 0.1
    F = lambda x, u, t=0.0: jnp.array([x[0] + dt * x[1], x[1]])
    h = lambda x, t=0.0: jnp.array([jnp.sqrt(x[0] ** 2 + 4.0)])
    Q = jnp.eye(2) * 1e-4
    R = jnp.eye(1) * 1e-3
    x_true = np.array([2.0, -0.5])
    b = GaussianBelief(jnp.array([1.0, 0.0]), jnp.eye(2))
    for i in range(100):
        x_true = np.array([x_true[0] + dt * x_true[1], x_true[1]])
        z = np.sqrt(x_true[0] ** 2 + 4.0) + rng.normal(0, np.sqrt(1e-3))
        b = ukf.ukf_step(F, h, b, jnp.zeros(1), jnp.array([z]), Q, R)
    assert abs(float(b.mean[0]) - x_true[0]) < 0.2


def test_kalman_bucy_converges(rng):
    a = -1.0
    f = lambda x, u, t=0.0: a * x
    h = lambda x, t=0.0: x
    Q = jnp.eye(1) * 0.1
    R = jnp.eye(1) * 0.1
    b = GaussianBelief(jnp.array([2.0]), jnp.eye(1))
    x_true = 1.0
    dt = 0.01
    for i in range(500):
        x_true *= np.exp(a * dt)
        z = jnp.array([x_true + rng.normal(0, 0.05)])
        b = kalman.kalman_bucy_step(f, h, b, jnp.zeros(1), z, Q, R, dt)
    assert abs(float(b.mean[0]) - x_true) < 0.1
    # covariance should approach the CARE steady state
    assert float(b.cov[0, 0]) < 0.2


def test_iekf_quaternion_state(rng):
    """IEKF on a rotating rigid body with vector observations (star tracker)."""
    dt = 0.05
    omega = jnp.array([0.3, -0.2, 0.5])  # known body rate

    def F(x, u, t=0.0):
        q = x[0:4]
        return rot.qmul(q, rot.q_exp(omega * dt))

    ref_dir = jnp.array([0.0, 0.0, 1.0])

    def h(x, t=0.0):
        q = x[0:4]
        return rot.qrot_inv(q, ref_dir)  # direction seen in body frame

    ref_dir2 = jnp.array([1.0, 0.0, 0.0])

    def h2(x, t=0.0):
        q = x[0:4]
        return jnp.concatenate([rot.qrot_inv(q, ref_dir), rot.qrot_inv(q, ref_dir2)])

    ret = invariant.quat_state_retraction(0, 4, 3)
    Q = jnp.eye(3) * 1e-6
    R = jnp.eye(6) * 1e-4
    q_true = rot.qidentity(jnp.float64)
    b = GaussianBelief(
        rot.qmul(rot.qidentity(jnp.float64), rot.q_exp(jnp.array([0.2, -0.1, 0.15]))),
        jnp.eye(3) * 0.1,
    )
    for i in range(60):
        q_true = rot.qmul(q_true, rot.q_exp(omega * dt))
        z = h2(q_true) + jnp.asarray(rng.normal(0, 1e-2, 6))
        b = invariant.iekf_step(F, h2, ret, b, None, z, Q, R)
    err_angle = float(jnp.linalg.norm(rot.q_log(rot.qmul(rot.qconj(q_true), b.mean[0:4]))))
    assert err_angle < 0.02


def test_hamiltonian_maps_match_kf(rng):
    A, _, C = _lin_sys()
    Q = jnp.eye(2) * 1e-3
    R = jnp.eye(1) * 1e-2
    P = jnp.eye(2) * 0.5
    Tp = invariant.hamiltonian_predict_map(A, Q)
    P_pred = invariant.apply_hamiltonian(Tp, P)
    np.testing.assert_allclose(P_pred, A @ P @ A.T + Q, atol=1e-10)
    Tu = invariant.hamiltonian_update_map(C, R)
    P_upd = invariant.apply_hamiltonian(Tu, P_pred)
    # information-form update: (P⁻¹ + CᵀR⁻¹C)⁻¹
    P_ref = np.linalg.inv(np.linalg.inv(np.asarray(P_pred)) + np.asarray(C).T @ np.linalg.inv(np.asarray(R)) @ np.asarray(C))
    np.testing.assert_allclose(P_upd, P_ref, atol=1e-10)
    # aggregate composition == sequential application
    Tc = invariant.compose_hamiltonian(Tu, Tp)
    np.testing.assert_allclose(invariant.apply_hamiltonian(Tc, P), P_upd, atol=1e-10)


def test_belief_ops(rng):
    b = GaussianBelief(jnp.array([1.0, 2.0]), jnp.array([[2.0, 0.5], [0.5, 1.0]]))
    key = jax.random.PRNGKey(0)
    samples = b.sample(key, (20000,))
    np.testing.assert_allclose(samples.mean(0), b.mean, atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(samples).T), b.cov, atol=0.1)
    # KL of identical beliefs is 0
    np.testing.assert_allclose(belief.kl_divergence(b, b), 0.0, atol=1e-10)
    assert float(belief.belief_distance(b, GaussianBelief(b.mean + 1.0, b.cov))) > 0


def test_dlqg_gains(rng):
    A, B, C = _lin_sys()
    g = lqg.dlqg(A, B, C, jnp.eye(2), jnp.eye(1) * 0.1, jnp.eye(2) * 1e-3, jnp.eye(1) * 1e-2)
    # closed loop stable
    eig = np.linalg.eigvals(np.asarray(A - B @ g.K))
    assert np.all(np.abs(eig) < 1)
    # estimator stable
    eig2 = np.linalg.eigvals(np.asarray(A - A @ g.L @ C)) if False else np.linalg.eigvals(
        np.asarray((jnp.eye(2) - g.L @ C) @ A)
    )
    assert np.all(np.abs(eig2) < 1)


def test_finite_horizon_lqr_converges_to_ih():
    from reak_tpu.math import are

    A, B, _ = _lin_sys()
    Q, R = jnp.eye(2), jnp.eye(1) * 0.1
    Kinf, Pinf = are.dlqr(A, B, Q, R)
    Ks, P0 = lqg.finite_horizon_dlqr(A, B, Q, R, Q, 200)
    np.testing.assert_allclose(Ks[0], Kinf, atol=1e-8)
    np.testing.assert_allclose(P0, Pinf, atol=1e-6)

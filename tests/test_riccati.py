"""Riccati-recursion MPC solver vs the condensed QP path (cross-implementation
check, the reference's own validation style — SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.ctrl import mpc, systems, riccati
from reak_tpu.ctrl.qp import solve_box_qp
from reak_tpu.math.linalg import small_chol_solve


def test_small_chol_solve(rng):
    for n in [2, 6, 12]:
        A = rng.standard_normal((7, n, n))
        G = jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))
        rhs = jnp.asarray(rng.standard_normal((7, n, 3)))
        x = small_chol_solve(G, rhs)
        np.testing.assert_allclose(G @ x, rhs, atol=1e-8)
        b = jnp.asarray(rng.standard_normal((7, n)))
        xv = small_chol_solve(G, b)
        np.testing.assert_allclose(
            jnp.einsum("bij,bj->bi", G, xv), b, atol=1e-8
        )


def _ltv_problem(rng, H=20, n=4, m=2):
    A_seq = jnp.asarray(np.eye(n) + 0.05 * rng.standard_normal((H, n, n)))
    B_seq = jnp.asarray(0.3 * rng.standard_normal((H, n, m)))
    c_seq = jnp.asarray(0.01 * rng.standard_normal((H, n)))
    Q = jnp.eye(n)
    QN = jnp.eye(n) * 5.0
    R = jnp.eye(m) * 0.1
    x0 = jnp.asarray(rng.standard_normal(n))
    return A_seq, B_seq, c_seq, Q, QN, R, x0


def test_lqr_solve_matches_dense(rng):
    """Unconstrained Riccati solve == dense KKT solution of the same QP."""
    A_seq, B_seq, c_seq, Q, QN, R, x0 = _ltv_problem(rng)
    H, n, m = A_seq.shape[0], A_seq.shape[-1], B_seq.shape[-1]
    # gradient at u=0, then Newton step with plain R = exact minimizer
    u0 = jnp.zeros((H, m))
    grad, _ = riccati.qp_gradient(A_seq, B_seq, c_seq, Q, QN, R, x0, u0)
    bw = riccati.lqr_backward(A_seq, B_seq, Q, QN, jnp.broadcast_to(R, (H, m, m)))
    du = riccati.lqr_solve_rhs(bw, A_seq, B_seq, grad, jnp.zeros(n))
    u_star = u0 + du
    # dense reference via condensation
    Sx, Su, d = mpc.condense(A_seq, B_seq, c_seq, x0)
    prob = mpc.MPCProblem(Q=Q, R=R, QN=QN, u_min=None, u_max=None, horizon=H)
    H_qp, g = mpc.build_qp(prob, Sx, Su, d, x0)
    u_dense = -jnp.linalg.solve(H_qp, g).reshape(H, m)
    np.testing.assert_allclose(u_star, u_dense, atol=1e-8)


def test_gradient_matches_condensed(rng):
    A_seq, B_seq, c_seq, Q, QN, R, x0 = _ltv_problem(rng)
    H, m = A_seq.shape[0], B_seq.shape[-1]
    us = jnp.asarray(rng.standard_normal((H, m)))
    grad, _ = riccati.qp_gradient(A_seq, B_seq, c_seq, Q, QN, R, x0, us)
    Sx, Su, d = mpc.condense(A_seq, B_seq, c_seq, x0)
    prob = mpc.MPCProblem(Q=Q, R=R, QN=QN, u_min=None, u_max=None, horizon=H)
    H_qp, g = mpc.build_qp(prob, Sx, Su, d, x0)
    grad_dense = (H_qp @ us.reshape(-1) + g).reshape(H, m)
    np.testing.assert_allclose(grad, grad_dense, atol=1e-8)


def test_box_mpc_riccati_matches_condensed_pdip(rng):
    A_seq, B_seq, c_seq, Q, QN, R, x0 = _ltv_problem(rng)
    H, m = A_seq.shape[0], B_seq.shape[-1]
    lb = jnp.full(m, -0.4)
    ub = jnp.full(m, 0.4)
    u_ric, xs = riccati.solve_box_mpc_riccati(
        A_seq, B_seq, c_seq, Q, QN, R, x0, lb, ub, iters=20
    )
    Sx, Su, d = mpc.condense(A_seq, B_seq, c_seq, x0)
    prob = mpc.MPCProblem(Q=Q, R=R, QN=QN, u_min=lb, u_max=ub, horizon=H)
    H_qp, g = mpc.build_qp(prob, Sx, Su, d, x0)
    res = solve_box_qp(H_qp, g, jnp.tile(lb, H), jnp.tile(ub, H), iters=25)
    np.testing.assert_allclose(u_ric.reshape(-1), res.x, atol=1e-6)
    # some bounds must be active for this to be a meaningful test
    assert float(jnp.sum(jnp.abs(jnp.abs(u_ric) - 0.4) < 1e-6)) > 0


def test_box_mpc_riccati_with_reference_tracking(rng):
    A_seq, B_seq, c_seq, Q, QN, R, x0 = _ltv_problem(rng, H=15)
    H, n, m = A_seq.shape[0], A_seq.shape[-1], B_seq.shape[-1]
    x_ref = jnp.asarray(0.3 * rng.standard_normal((H, n)))
    lb, ub = jnp.full(m, -2.0), jnp.full(m, 2.0)
    u_ric, _ = riccati.solve_box_mpc_riccati(
        A_seq, B_seq, c_seq, Q, QN, R, x0, lb, ub, x_ref=x_ref, iters=20
    )
    Sx, Su, d = mpc.condense(A_seq, B_seq, c_seq, x0)
    prob = mpc.MPCProblem(Q=Q, R=R, QN=QN, u_min=lb, u_max=ub, horizon=H)
    H_qp, g = mpc.build_qp(prob, Sx, Su, d, x0, x_ref=x_ref)
    res = solve_box_qp(H_qp, g, jnp.tile(lb, H), jnp.tile(ub, H), iters=25)
    np.testing.assert_allclose(u_ric.reshape(-1), res.x, atol=1e-6)


def test_mpc_solve_riccati_method(rng):
    """mpc.solve(method='riccati') agrees with method='condensed' on the KTE
    2-link plant."""
    from reak_tpu.kte import models

    spec = models.planar_2link()
    f = systems.kte_continuous(spec)
    F = systems.rk4_discrete(f, 0.02)
    lin = systems.kte_ltv_linearizer(spec, 0.02)
    prob = mpc.MPCProblem(
        Q=jnp.eye(4),
        R=jnp.eye(2) * 0.05,
        QN=jnp.eye(4) * 5,
        u_min=jnp.full(2, -3.0),
        u_max=jnp.full(2, 3.0),
        horizon=12,
    )
    x0 = jnp.array([0.5, -0.3, 0.0, 0.0])
    s1 = mpc.solve(F, prob, x0, qp_iters=20, linearizer=lin, method="riccati")
    s2 = mpc.solve(F, prob, x0, qp_iters=25, linearizer=lin, method="condensed")
    np.testing.assert_allclose(s1.u, s2.u, atol=1e-5)

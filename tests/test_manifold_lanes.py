"""Lanes-layout free-base scenario MPC (ctrl/manifold_lanes) vs the generic
batch-first composition (ctrl/mpc_manifold) — the round-5 free-base speed
path must not change the physics or the optimum."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.ctrl import manifold_lanes as ml
from reak_tpu.ctrl import mpc_manifold as mm
from reak_tpu.ctrl import ss_systems as ss
from reak_tpu.ctrl.mpc import MPCProblem


def _params():
    return ss.satellite3D(mass=10.0,
                          inertia=jnp.diag(jnp.asarray([4.0, 5.0, 6.0])))


def _problem(H=12):
    w12 = jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])
    return MPCProblem(Q=jnp.diag(w12), R=jnp.eye(6) * 0.05,
                      QN=jnp.diag(10.0 * w12),
                      u_min=jnp.full(6, -20.0), u_max=jnp.full(6, 20.0),
                      horizon=H)


def _states(rng, B):
    xs = []
    for _ in range(B):
        q = rng.standard_normal(4)
        q = q / np.linalg.norm(q)
        xs.append(np.concatenate([
            0.5 * rng.standard_normal(3), q,
            0.2 * rng.standard_normal(3), 0.3 * rng.standard_normal(3)]))
    return jnp.asarray(np.stack(xs))


def test_sat_step_lanes_matches_batchfirst_imdt(rng):
    """Lanes step == satellite3D_imdt exactly (same math, relayout only)."""
    params = _params()
    dt = 0.1
    F = ss.satellite3D_imdt(params, dt)
    step_l = ml.sat_step_lanes(params, dt)
    B = 7
    x = _states(rng, B)
    u = jnp.asarray(rng.standard_normal((B, 6)) * 5.0)
    out_bf = jax.vmap(F)(x, u)
    out_l = step_l(x.T, u.T).T
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_bf),
                               rtol=1e-12, atol=1e-12)


def test_quat_local_lanes_matches_retraction(rng):
    ret = ss.sat3D_retraction()
    B = 5
    x1 = _states(rng, B)
    x0 = _states(rng, B)
    e_bf = jax.vmap(ret.local)(x1, x0)
    e_l = ml.quat_local_lanes(x1.T, x0.T).T
    np.testing.assert_allclose(np.asarray(e_l), np.asarray(e_bf),
                               rtol=1e-12, atol=1e-12)


def test_sat_error_ltv_matches_ad_linearization(rng):
    """The analytic error-state LTV agrees with AD through the exact discrete
    step + retraction (mpc_manifold.linearize_ltv_manifold) to O(dt²)."""
    params = _params()
    dt = 0.02
    F = ss.satellite3D_imdt(params, dt)
    ret = ss.sat3D_retraction()
    ltv = ml.sat_error_ltv_lanes(params, dt)
    B = 4
    x = _states(rng, B)
    u = jnp.asarray(rng.standard_normal((B, 6)) * 3.0)
    x1 = jax.vmap(F)(x, u)
    A_ad, B_ad = mm.linearize_ltv_manifold(
        F, ret, x, u, x1)                           # (B, 12, 12), (B, 12, 6)
    A_l, B_l, c_l = ltv(x.T, u.T)
    A_l = jnp.moveaxis(A_l, -1, 0)
    B_l = jnp.moveaxis(B_l, -1, 0)
    assert float(jnp.max(jnp.abs(A_l - A_ad))) < 5e-3 * dt / 0.02
    assert float(jnp.max(jnp.abs(B_l - B_ad))) < 5e-3 * dt / 0.02
    # c = −B·ū exactly
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(c_l, -1, 0)),
        np.asarray(-jnp.einsum("bij,bj->bi", B_l, u)), rtol=1e-10, atol=1e-12)


def _traj_cost(prob, ret, us, xs, x_ref):
    """Manifold tracking cost of an (absolute) input/trajectory pair."""
    e = jax.vmap(lambda xr, x: ret.local(xr, x))(
        jnp.broadcast_to(x_ref, xs.shape), xs)
    Qs = jnp.concatenate([jnp.tile(prob.Q[None], (prob.horizon - 1, 1, 1)),
                          prob.QN[None]], axis=0)
    cost = 0.5 * jnp.einsum("ti,tij,tj->", e, Qs, e)
    cost = cost + 0.5 * jnp.einsum("ti,ij,tj->", us, prob.R, us)
    return float(cost)


def test_scenario_mpc_lanes_matches_generic(rng):
    """The lanes SQP solver reaches the same manifold optimum as the generic
    AD-linearized path: near-identical controls and equal cost to ~0.1%."""
    params = _params()
    dt = 0.1
    H = 12
    prob = _problem(H)
    F = ss.satellite3D_imdt(params, dt)
    ret = ss.sat3D_retraction()
    B = 4
    x0s = _states(rng, B)
    x_ref = ss.default_state().at[0:3].set(jnp.array([1.0, 0.5, -0.3]))
    us0 = jnp.zeros((B, H, 6))

    solve_gen = mm.make_scenario_mpc(F, ret, prob, qp_iters=10, sqp_iters=4)
    u_gen, xs_gen = solve_gen(x0s, x_ref, us0)

    solve_l = ml.make_sat_scenario_mpc_lanes(params, prob, dt, qp_iters=10,
                                             sqp_iters=4)
    u_l, xs_l = solve_l(x0s, x_ref, us0)

    # both roll out the exact imdt step, so trajectories follow controls
    for b in range(B):
        c_gen = _traj_cost(prob, ret, u_gen[b], xs_gen[b], x_ref)
        c_l = _traj_cost(prob, ret, u_l[b], xs_l[b], x_ref)
        assert abs(c_l - c_gen) < 2e-3 * max(abs(c_gen), 1.0)
    err = float(jnp.max(jnp.abs(u_l - u_gen)))
    scale = float(jnp.max(jnp.abs(u_gen)))
    assert err < 0.02 * max(scale, 1.0)


def test_scenario_mpc_lanes_active_box_constraints(rng):
    """With tight bounds the lanes solver saturates the box exactly like the
    generic path (constraint handling ports to the tracking kernel path)."""
    params = _params()
    dt = 0.1
    H = 10
    w12 = jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])
    prob = MPCProblem(Q=jnp.diag(w12), R=jnp.eye(6) * 0.05,
                      QN=jnp.diag(10.0 * w12),
                      u_min=jnp.full(6, -2.0), u_max=jnp.full(6, 2.0),
                      horizon=H)
    B = 3
    x0s = _states(rng, B)
    x_ref = ss.default_state().at[0:3].set(jnp.array([2.0, -1.5, 1.0]))
    us0 = jnp.zeros((B, H, 6))
    solve_l = ml.make_sat_scenario_mpc_lanes(params, prob, dt, qp_iters=12,
                                             sqp_iters=3)
    u_l, _ = solve_l(x0s, x_ref, us0)
    assert float(jnp.max(u_l)) <= 2.0 + 1e-9
    assert float(jnp.min(u_l)) >= -2.0 - 1e-9
    # far target + tight box ⇒ some bounds are active
    n_active = int(jnp.sum(jnp.abs(jnp.abs(u_l) - 2.0) < 1e-6))
    assert n_active > 0

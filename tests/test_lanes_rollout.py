"""Dense-lanes KTE rollout (kte/lanes.py): equivalence with the register-form
SoA path and the generic dynamics, plus the full flagship MPC path.

The lanes module exists to kill the round-2 "4-5 minute XLA compile": same
math as kte/soa.py with the assembly expressed as einsums (a ~100× smaller
HLO graph).  These tests pin the equivalence at f64 so any divergence is a
real math change, not float noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.kte import models, soa, lanes
from reak_tpu.ctrl import mpc


@pytest.fixture(scope="module")
def spec():
    return models.manip_3r3r()


def _rand_xu(rng, B, H=8, nv=6):
    x0 = jnp.asarray(np.concatenate([rng.uniform(-0.5, 0.5, (B, nv)),
                                     rng.uniform(-0.3, 0.3, (B, nv))], axis=1))
    us = jnp.asarray(rng.uniform(-5.0, 5.0, (B, H, nv)))
    return x0, us


def test_terms_match_register_form(spec, rng):
    B = 7
    q = jnp.asarray(rng.uniform(-0.8, 0.8, (6, B)))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (6, B)))
    M_l, f_l = lanes.make_terms_lanes(spec)(q, qd)
    M_s, f_s = soa.make_terms_soa(spec)(
        tuple(q[i] for i in range(6)), tuple(qd[i] for i in range(6)))
    M_s = jnp.stack([jnp.stack(list(r), 0) for r in M_s], 0)
    f_s = jnp.stack(list(f_s), 0)
    np.testing.assert_allclose(np.asarray(M_l), np.asarray(M_s),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_s),
                               rtol=1e-11, atol=1e-10)


@pytest.mark.slow  # compiles the register-form path (minutes on XLA-CPU)
def test_rollout_matches_register_form(spec, rng):
    B, H = 5, 8
    x0, us = _rand_xu(rng, B, H)
    out_l = jax.jit(lanes.make_rollout_ltv_batchfirst(spec, 0.01, H))(x0, us)
    out_r = jax.jit(soa.make_rollout_ltv_soa(spec, 0.01, H))(x0, us)
    for name, a, b in zip("ABcx", out_l, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-10,
                                   err_msg=f"{name}_seq mismatch")


def test_lanes_prismatic_chain_vs_generic(rng):
    """Mixed revolute/prismatic chain: lanes forward dynamics matches the
    generic kte.dynamics path.  (The register-form soa path cannot trace this
    config — constant mass-matrix entries break its tuple tangents — so the
    generic path is the oracle here.)"""
    from reak_tpu import kte
    from reak_tpu.kte.spec import ChainSpec, REVOLUTE, PRISMATIC
    from reak_tpu.ctrl.riccati_soa import _chol_solve_lanes

    spec = ChainSpec.build(
        [PRISMATIC, REVOLUTE, REVOLUTE],
        axes=[[1.0, 0, 0], [0.0, 0, 1], [0.0, -1, 0]],
        offsets_pos=[[0.0, 0, 0.2], [0.1, 0, 0.1], [0.0, 0, 0.3]],
        com_pos=[[0.0, 0, 0.05], [0.15, 0, 0], [0.1, 0, 0]],
        masses=[2.0, 1.5, 0.8],
        inertias=np.stack([np.diag([0.02, 0.02, 0.01])] * 3),
        damping=[0.5, 0.2, 0.1],
        name="prt",
    )
    B = 4
    q = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)))
    qd = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)))
    tau = jnp.asarray(rng.uniform(-2.0, 2.0, (B, 3)))
    M, f = lanes.make_terms_lanes(spec)(q.T, qd.T)
    qdd_l = _chol_solve_lanes(M, (f + tau.T)[:, None, :])[:, 0].T
    qdd_g = jax.vmap(lambda qq, qv, tt: kte.forward_dynamics(spec, qq, qv, tt))(
        q, qd, tau)
    np.testing.assert_allclose(np.asarray(qdd_l), np.asarray(qdd_g),
                               rtol=1e-8, atol=1e-9)
    # (the lanes ROLLOUT body is compile-tested on the flagship chain in
    # test_rollout_matches_register_form / the MPC tests — compiling a second
    # chain's scan body here would only re-pay XLA-CPU compile time)


@pytest.mark.slow  # compiles the register-form path (minutes on XLA-CPU)
def test_full_mpc_lanes_vs_register(spec, rng):
    """End-to-end flagship solver: lanes rollout == register rollout through
    the full 8-iteration Riccati PDIP (f64)."""
    H, m = 12, 6
    prob = mpc.MPCProblem(
        Q=jnp.diag(jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])),
        R=jnp.eye(m) * 0.05,
        QN=jnp.diag(jnp.concatenate([jnp.full(6, 50.0), jnp.full(6, 5.0)])),
        u_min=jnp.full(m, -40.0),
        u_max=jnp.full(m, 40.0),
        horizon=H,
    )
    B = 4
    x0, us = _rand_xu(rng, B, H)
    us0 = jnp.zeros_like(us)
    sol_l = jax.jit(mpc.make_kte_mpc(spec, prob, 0.01, qp_iters=8,
                                     rollout="lanes"))
    sol_r = jax.jit(mpc.make_kte_mpc(spec, prob, 0.01, qp_iters=8,
                                     rollout="register"))
    ul, xl = sol_l(x0, us0)
    ur, xr = sol_r(x0, us0)
    np.testing.assert_allclose(np.asarray(ul), np.asarray(ur),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(xl), np.asarray(xr),
                               rtol=1e-7, atol=1e-8)


def test_lanes_vs_generic_dynamics(spec, rng):
    """Forward dynamics from the lanes terms agrees with kte.dynamics."""
    from reak_tpu import kte
    from reak_tpu.ctrl.riccati_soa import _chol_solve_lanes

    B = 3
    q = jnp.asarray(rng.uniform(-0.8, 0.8, (B, 6)))
    qd = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 6)))
    tau = jnp.asarray(rng.uniform(-3.0, 3.0, (B, 6)))
    terms = lanes.make_terms_lanes(spec)
    M, f = terms(q.T, qd.T)
    qdd_l = _chol_solve_lanes(M, (f + tau.T)[:, None, :])[:, 0].T  # (B, 6)
    qdd_g = jax.vmap(lambda qq, qv, tt: kte.forward_dynamics(spec, qq, qv, tt))(
        q, qd, tau)
    np.testing.assert_allclose(np.asarray(qdd_l), np.asarray(qdd_g),
                               rtol=1e-8, atol=1e-9)

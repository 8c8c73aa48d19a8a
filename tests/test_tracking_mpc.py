"""Tracking MPC (x_ref/u_ref) on the flagship fixed-base lanes path and the
unified KTE scenario-MPC dispatcher (VERDICT r4 item 2 + weak #1)."""
import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.kte import models
from reak_tpu.ctrl import mpc
from reak_tpu.ctrl.mpc_manifold import make_kte_scenario_mpc
from reak_tpu.ctrl.riccati import solve_box_mpc_riccati
from reak_tpu.kte.lanes import make_rollout_ltv_lanes


def _problem(H, m=2):
    return mpc.MPCProblem(
        Q=jnp.diag(jnp.concatenate([jnp.full(m, 10.0), jnp.full(m, 1.0)])),
        R=jnp.eye(m) * 0.05,
        QN=jnp.diag(jnp.concatenate([jnp.full(m, 50.0), jnp.full(m, 5.0)])),
        u_min=jnp.full(m, -30.0), u_max=jnp.full(m, 30.0), horizon=H)


def test_tracking_matches_vmap_riccati_with_refs(rng):
    """Lanes tracking path == batch-first riccati with the same x_ref."""
    spec = models.planar_2link()
    H, m = 12, 2
    prob = _problem(H, m)
    dt = 0.02
    B = 3
    x0s = jnp.asarray(rng.standard_normal((B, 4)) * 0.3)
    us0 = jnp.zeros((B, H, m))
    x_ref = jnp.asarray([0.4, -0.3, 0.0, 0.0])

    solver = mpc.make_kte_mpc(spec, prob, dt, qp_iters=10, sqp_iters=1,
                              rollout="lanes")
    us_l, xs_l = solver(x0s, us0, x_ref=x_ref)

    roll = make_rollout_ltv_lanes(spec, dt, H)
    A_l, B_l, c_l, _ = roll(x0s, us0)
    xr = jnp.broadcast_to(x_ref, (H, 4))

    def one(A, Bm, c, x0):
        return solve_box_mpc_riccati(
            A, Bm, c, prob.Q, prob.QN, prob.R, x0, prob.u_min, prob.u_max,
            x_ref=xr, iters=10)

    us_v, xs_v = jax.vmap(one)(
        jnp.moveaxis(A_l, -1, 0), jnp.moveaxis(B_l, -1, 0),
        jnp.moveaxis(c_l, -1, 0), x0s)
    np.testing.assert_allclose(np.asarray(us_l), np.asarray(us_v),
                               rtol=1e-8, atol=1e-9)


def test_tracking_converges_to_nonzero_target(rng):
    """With a nonzero joint-space reference the tracked trajectory ends
    near the target, NOT near the origin the regulator would pick."""
    spec = models.planar_2link()
    H, m = 30, 2
    prob = _problem(H, m)
    x0s = jnp.zeros((2, 4)).at[:, 0].set(jnp.asarray([-0.2, 0.1]))
    us0 = jnp.zeros((2, H, m))
    x_ref = jnp.asarray([0.5, -0.4, 0.0, 0.0])
    # sqp_iters=1 (the bench configuration): full-step SQP without a
    # globalization safeguard can diverge when re-linearized about an
    # aggressive first QP solution at coarse dt
    solver = mpc.make_kte_mpc(spec, prob, 0.05, qp_iters=10, sqp_iters=1,
                              rollout="lanes")
    us, xs = solver(x0s, us0, x_ref=x_ref)
    # tracked endpoint is pulled most of the way to the reference...
    err = np.linalg.norm(np.asarray(xs[:, -1, 0:2] - x_ref[None, 0:2]),
                         axis=-1)
    assert np.max(err) < 0.3
    # ...while the regulator (no ref) heads for the origin instead
    us_r, xs_r = solver(x0s, us0)
    err_r = np.linalg.norm(np.asarray(xs_r[:, -1, 0:2] - x_ref[None, 0:2]),
                           axis=-1)
    assert np.min(err_r) > 2.0 * np.max(err)


def test_sqp_linesearch_rescues_divergent_multipass(rng):
    """Full-step SQP at coarse dt diverges to NaN when re-linearized about
    an unstable rollout (sqp_iters≥2, dt=0.05 on the 2-link); the
    per-scenario cost backtracking must keep it finite AND at least as good
    as the single-pass solution."""
    spec = models.planar_2link()
    H, m = 30, 2
    prob = _problem(H, m)
    x0s = jnp.zeros((2, 4)).at[:, 0].set(jnp.asarray([-0.2, 0.1]))
    us0 = jnp.zeros((2, H, m))
    x_ref = jnp.asarray([0.5, -0.4, 0.0, 0.0])

    # without globalization: documented divergence
    bad = mpc.make_kte_mpc(spec, prob, 0.05, qp_iters=10, sqp_iters=3,
                           rollout="lanes", sqp_linesearch=False)
    us_b, _ = bad(x0s, us0, x_ref=x_ref)
    assert not np.all(np.isfinite(np.asarray(us_b)))

    # with globalization: finite, and closer to the target than 1 pass
    good = mpc.make_kte_mpc(spec, prob, 0.05, qp_iters=10, sqp_iters=3,
                            rollout="lanes", sqp_linesearch=True)
    us_g, xs_g = good(x0s, us0, x_ref=x_ref)
    assert np.all(np.isfinite(np.asarray(us_g)))
    one = mpc.make_kte_mpc(spec, prob, 0.05, qp_iters=10, sqp_iters=1,
                           rollout="lanes")
    us_1, xs_1 = one(x0s, us0, x_ref=x_ref)

    # compare on the TRUE objective (what the line search guarantees):
    # RK4 rollout + the problem's quadratic tracking cost
    from reak_tpu.kte.lanes import make_rollout_lanes

    roll = make_rollout_lanes(spec, 0.05)

    def true_cost(us):
        ul = jnp.moveaxis(us, 0, -1)
        dx = roll(x0s, ul) - x_ref[None, :, None]
        qx = jnp.einsum("hib,ij,hjb->b", dx[:-1], prob.Q, dx[:-1])
        qn = jnp.einsum("ib,ij,jb->b", dx[-1], prob.QN, dx[-1])
        ru = jnp.einsum("hib,ij,hjb->b", ul, prob.R, ul)
        return np.asarray(0.5 * (qx + qn + ru))

    assert np.all(true_cost(us_g) <= true_cost(us_1) + 1e-6)


def test_receding_horizon_tracking_absorbs_model_drift():
    """The 2-link is open-loop sensitive: replaying a full-horizon
    model-optimal sequence on the true RK4 dynamics drifts by radians
    (see the sqp_linesearch docstring).  CLOSED loop — re-solve each step,
    apply only u[0] to the true dynamics — must converge to the target
    anyway: the intended usage of the tracking solver."""
    from reak_tpu.ctrl import systems

    spec = models.planar_2link()
    H, m, dt = 20, 2, 0.05
    # cheap torque (R small) so the LQ-optimal gravity-holding offset is
    # negligible and the closed loop lands ON the target
    prob = mpc.MPCProblem(
        Q=jnp.diag(jnp.asarray([10.0, 10.0, 1.0, 1.0])),
        R=jnp.eye(m) * 1e-3,
        QN=jnp.diag(jnp.asarray([50.0, 50.0, 5.0, 5.0])),
        u_min=jnp.full(m, -30.0), u_max=jnp.full(m, 30.0), horizon=H)
    x_ref = jnp.asarray([0.4, -0.3, 0.0, 0.0])
    base = mpc.make_kte_mpc(spec, prob, dt, qp_iters=8, sqp_iters=1,
                            rollout="lanes")
    solver = jax.jit(lambda a, b: base(a, b, x_ref=x_ref))
    F_true = jax.jit(systems.kte_discrete(spec, dt))  # the plant (RK4)

    x = jnp.zeros(4)
    # fresh (zero) warm start per step: re-linearizing about an aggressive
    # carried-over sequence at this coarse dt can blow the nominal rollout
    u0 = jnp.zeros((1, H, m))
    for _ in range(60):
        us, _ = solver(x[None], u0)
        x = F_true(x, us[0, 0])
    err = np.asarray(jnp.abs(x[0:2] - x_ref[0:2]))
    assert np.max(err) < 0.05, err
    # and the joint rates have settled
    assert float(jnp.max(jnp.abs(x[2:4]))) < 0.1


def test_kte_scenario_dispatch_fixed_and_free(rng):
    """make_kte_scenario_mpc routes fixed-base chains to the flagship lanes
    solver (tracking) and free-base chains to the manifold lanes SQP."""
    # fixed-base
    spec_f = models.planar_2link()
    H = 10
    prob = _problem(H, 2)
    solve_f = make_kte_scenario_mpc(spec_f, prob, 0.02, qp_iters=6,
                                    sqp_iters=1)
    x0s = jnp.asarray(rng.standard_normal((2, 4)) * 0.2)
    us, xs = solve_f(x0s, jnp.asarray([0.3, 0.0, 0.0, 0.0]),
                     jnp.zeros((2, H, 2)))
    assert us.shape == (2, H, 2) and np.all(np.isfinite(np.asarray(us)))

    # free-base
    spec_b = models.free_floating_3d()
    nv = spec_b.nv
    w = jnp.concatenate([jnp.full(nv, 5.0), jnp.full(nv, 0.5)])
    prob_b = mpc.MPCProblem(Q=jnp.diag(w), R=jnp.eye(nv) * 0.05,
                            QN=jnp.diag(10.0 * w),
                            u_min=jnp.full(nv, -30.0),
                            u_max=jnp.full(nv, 30.0), horizon=H)
    solve_b = make_kte_scenario_mpc(spec_b, prob_b, 0.05, qp_iters=6,
                                    sqp_iters=2)
    x0 = jnp.zeros(spec_b.nq + nv).at[3].set(1.0).at[0].set(0.2)
    x_ref = jnp.zeros(spec_b.nq + nv).at[3].set(1.0)
    us_b, xs_b = solve_b(jnp.stack([x0, x0]), x_ref,
                         jnp.zeros((2, H, nv)))
    assert us_b.shape == (2, H, nv)
    assert np.all(np.isfinite(np.asarray(us_b)))
    # the free body is steered toward the origin pose
    p_end = np.asarray(xs_b[:, -1, 0:3])
    assert np.max(np.abs(p_end)) < 0.2

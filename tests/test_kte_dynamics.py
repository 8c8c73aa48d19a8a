"""KTE chain dynamics vs analytic oracles.

Parity model: the reference validates dynamics by simulation-as-oracle
(test_am.cpp pendulum, test_bm.cpp mass matrix); here we check against
closed-form Lagrangian results for the same mechanisms.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu import kte
from reak_tpu.kte import models
from reak_tpu.math import rotations as rot


# ---------------------------------------------------------------------------
# pendulum (ref mechanism: test_am.cpp:100-126)
# ---------------------------------------------------------------------------


def test_pendulum_dynamics_analytic():
    L, m, Im, g = 0.5, 1.0, 5.0, 9.81
    spec = models.pendulum(length=L, mass=m, motor_inertia=Im, gravity=g)
    for qv, qdv in [(0.3, 0.0), (1.2, -2.0), (-0.7, 1.5)]:
        q = jnp.array([qv])
        qd = jnp.array([qdv])
        M = kte.mass_matrix(spec, q)
        np.testing.assert_allclose(M[0, 0], m * L * L + Im, rtol=1e-12)
        qdd = kte.forward_dynamics(spec, q, qd)
        qdd_ref = -m * g * L * np.cos(qv) / (m * L * L + Im)
        np.testing.assert_allclose(qdd[0], qdd_ref, rtol=1e-10)


def test_pendulum_with_damping_and_friction():
    spec = models.pendulum(
        length=0.5, mass=1.0, motor_inertia=5.0, damping=0.3,
        stiction=(1e-6, 2e-6, 1.0, 0.9),
    )
    q = jnp.array([0.0])
    qd = jnp.array([2.0])  # well beyond slip velocity
    f = kte.bias_force(spec, q, qd)
    # gravity torque at q=0 is -mgL; damping -0.3*2; slip friction -0.9
    expected = -1.0 * 9.81 * 0.5 - 0.3 * 2.0 - 0.9
    np.testing.assert_allclose(f[0], expected, rtol=1e-10)
    # stiction zone: tiny velocity
    qd2 = jnp.array([0.5e-6])
    f2 = kte.bias_force(spec, q, qd2)
    exp2 = -1.0 * 9.81 * 0.5 - 0.3 * 0.5e-6 - 0.5e-6 * 1.0 / 1e-6
    np.testing.assert_allclose(f2[0], exp2, rtol=1e-9)


def test_reference_two_point_scheme_equivalence():
    """ReaK's test_am solver: q̈ = f(0) / (f(0) − f(1)) with f affine in q̈
    (test_am.cpp:47-59).  Check our forward_dynamics matches that scheme."""
    spec = models.pendulum()
    q, qd = jnp.array([0.8]), jnp.array([1.1])
    M = kte.mass_matrix(spec, q)
    f0 = kte.bias_force(spec, q, qd)  # f at qdd=0
    f1 = f0 - M @ jnp.ones(1)  # f at qdd=1 (affine)
    qdd_tp = f0[0] / (f0[0] - f1[0])
    np.testing.assert_allclose(kte.forward_dynamics(spec, q, qd)[0], qdd_tp, rtol=1e-10)


# ---------------------------------------------------------------------------
# double pendulum / 2-link (ref mechanism: test_bm.cpp)
# ---------------------------------------------------------------------------


def _two_link_lagrangian(l1, l2, m1, m2, lc1, lc2, I1, I2, g, q, qd):
    """Textbook planar 2-link M, C, g (Spong convention, gravity -y)."""
    q1, q2 = q
    a = I1 + I2 + m1 * lc1**2 + m2 * (l1**2 + lc2**2)
    b = m2 * l1 * lc2
    d = I2 + m2 * lc2**2
    M = np.array([[a + 2 * b * np.cos(q2), d + b * np.cos(q2)], [d + b * np.cos(q2), d]])
    C = np.array(
        [
            [-b * np.sin(q2) * qd[1], -b * np.sin(q2) * (qd[0] + qd[1])],
            [b * np.sin(q2) * qd[0], 0.0],
        ]
    )
    gv = np.array(
        [
            (m1 * lc1 + m2 * l1) * g * np.cos(q1) + m2 * lc2 * g * np.cos(q1 + q2),
            m2 * lc2 * g * np.cos(q1 + q2),
        ]
    )
    return M, C, gv


def test_two_link_mass_matrix_and_dynamics():
    l1, l2, m1, m2, g = 0.4, 0.3, 2.0, 1.0, 9.81
    spec = models.planar_2link(l1=l1, l2=l2, m1=m1, m2=m2, com_ratio=0.5, gravity=g)
    lc1, lc2 = 0.5 * l1, 0.5 * l2
    I1, I2 = m1 * l1 * l1 / 12, m2 * l2 * l2 / 12
    rng = np.random.default_rng(0)
    for _ in range(5):
        qv = rng.uniform(-2, 2, 2)
        qdv = rng.uniform(-3, 3, 2)
        Mr, Cr, gr = _two_link_lagrangian(l1, l2, m1, m2, lc1, lc2, I1, I2, g, qv, qdv)
        q, qd = jnp.asarray(qv), jnp.asarray(qdv)
        M = kte.mass_matrix(spec, q)
        np.testing.assert_allclose(M, Mr, atol=1e-10)
        # M qdd = tau - C qd - g  →  forward_dynamics(tau=0) = M⁻¹(-C qd - g)
        qdd_ref = np.linalg.solve(Mr, -Cr @ qdv - gr)
        np.testing.assert_allclose(kte.forward_dynamics(spec, q, qd), qdd_ref, atol=1e-9)
        # inverse dynamics round trip
        tau = kte.inverse_dynamics(spec, q, qd, jnp.asarray(qdd_ref))
        np.testing.assert_allclose(tau, 0.0, atol=1e-9)


def test_mass_matrix_derivative():
    spec = models.planar_2link()
    q = jnp.array([0.4, -0.8])
    qd = jnp.array([1.0, 2.0])
    M, Mdot = kte.mass_matrix_and_derivative(spec, q, qd)
    eps = 1e-6
    M2 = kte.mass_matrix(spec, q + eps * qd)
    np.testing.assert_allclose(Mdot, (M2 - M) / eps, atol=1e-5)


def test_energy_conservation_two_link():
    spec = models.planar_2link(gravity=9.81)

    def energy(q, qd):
        M = kte.mass_matrix(spec, q)
        res = kte.fk(spec, q)
        masses = jnp.asarray(np.asarray(spec.masses))
        pe = jnp.sum(masses * 9.81 * res.com_pos[:, 1])
        return 0.5 * qd @ M @ qd + pe

    q, qd = jnp.array([0.3, 0.2]), jnp.array([0.0, 0.0])
    dt = 1e-4
    e0 = energy(q, qd)

    @jax.jit
    def step(carry, _):
        q, qd = carry
        # RK4 on [q, qd]
        def f(y):
            qq, vv = y[:2], y[2:]
            return jnp.concatenate([vv, kte.forward_dynamics(spec, qq, vv)])

        y = jnp.concatenate([q, qd])
        k1 = f(y)
        k2 = f(y + 0.5 * dt * k1)
        k3 = f(y + 0.5 * dt * k2)
        k4 = f(y + dt * k3)
        y = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return (y[:2], y[2:]), None

    (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=2000)
    e1 = energy(q, qd)
    np.testing.assert_allclose(e1, e0, atol=1e-7)


# ---------------------------------------------------------------------------
# Jacobian consistency
# ---------------------------------------------------------------------------


def test_jacobian_vs_finite_difference():
    spec = models.manip_3r3r()
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, 6))
    Jv, Jw = kte.jacobians(spec, q)
    # finite-difference COM positions
    eps = 1e-7
    base = kte.fk(spec, q).com_pos
    for k in range(6):
        dq = jnp.zeros(6).at[k].add(eps)
        dp = (kte.fk(spec, q + dq).com_pos - base) / eps
        np.testing.assert_allclose(Jv[:, :, k], dp, atol=1e-5)


def test_jacobian_vs_jvp_orientation():
    spec = models.manip_3r3r()
    q = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, 6))
    qd = jnp.asarray(np.random.default_rng(6).standard_normal(6))
    _, Jw = kte.jacobians(spec, q)
    w = Jw @ qd
    # body angular velocity from quaternion rate: ω = 2 (Q* ⊗ Q̇)
    def quats(qq):
        return kte.fk(spec, qq).body_quat

    _, dquat = jax.jvp(quats, (q,), (qd,))
    Q = quats(q)
    w_ref = rot.omega_from_qdot(Q, dquat)
    np.testing.assert_allclose(w, w_ref, atol=1e-10)


# ---------------------------------------------------------------------------
# free-floating base
# ---------------------------------------------------------------------------


def test_free_floating_torque_free_euler():
    spec = models.free_floating_3d(mass=10.0, inertia_diag=(2.0, 3.0, 4.0))
    q = jnp.asarray(spec.neutral_q())
    w0 = jnp.array([0.5, -1.0, 2.0])
    qd = jnp.concatenate([jnp.zeros(3), w0])
    qdd = kte.forward_dynamics(spec, q, qd)
    I = np.diag([2.0, 3.0, 4.0])
    alpha_ref = np.linalg.solve(I, -np.cross(np.asarray(w0), I @ np.asarray(w0)))
    np.testing.assert_allclose(qdd[:3], 0.0, atol=1e-10)
    np.testing.assert_allclose(qdd[3:], alpha_ref, atol=1e-9)


def test_free_floating_momentum_conservation():
    spec = models.floating_arm(base_mass=50.0, base_inertia=(5.0, 6.0, 7.0),
                               arm_builder=models.planar_2link)
    rng = np.random.default_rng(11)
    q = jnp.asarray(np.concatenate([spec.neutral_q()[:7], rng.uniform(-1, 1, 2)]))
    qd = jnp.asarray(rng.standard_normal(8) * 0.3)

    def momentum(q, qd):
        res = kte.fk(spec, q)
        Jv, Jw = kte.jacobians(spec, q)
        masses = jnp.asarray(np.asarray(spec.masses))
        v = Jv @ qd
        return jnp.sum(masses[:, None] * v, axis=0)

    # d(linear momentum)/dt must be 0 in zero gravity: differentiate along flow
    qdd = kte.forward_dynamics(spec, q, qd)
    dq = kte.dynamics.config_rate(spec, q, qd)
    _, dP = jax.jvp(momentum, (q, qd), (dq, qdd))
    np.testing.assert_allclose(dP, 0.0, atol=1e-8)


def test_state_rate_shapes_and_quat_norm():
    spec = models.floating_arm(arm_builder=models.planar_2link)
    x = jnp.asarray(np.concatenate([spec.neutral_q(), np.zeros(spec.nv)]))
    dx = kte.state_rate(spec, x)
    assert dx.shape == (spec.nq + spec.nv,)
    # quaternion rate orthogonal to quaternion
    np.testing.assert_allclose(jnp.dot(dx[3:7], x[3:7]), 0.0, atol=1e-12)


# ---------------------------------------------------------------------------
# batching / jit
# ---------------------------------------------------------------------------


def test_vmap_forward_dynamics():
    spec = models.manip_3r3r()
    rng = np.random.default_rng(7)
    qs = jnp.asarray(rng.uniform(-1, 1, (32, 6)))
    qds = jnp.asarray(rng.standard_normal((32, 6)))
    taus = jnp.asarray(rng.standard_normal((32, 6)))
    fd = jax.jit(jax.vmap(lambda q, qd, t: kte.forward_dynamics(spec, q, qd, t)))
    qdd = fd(qs, qds, taus)
    assert qdd.shape == (32, 6)
    # spot-check one element
    np.testing.assert_allclose(
        qdd[3], kte.forward_dynamics(spec, qs[3], qds[3], taus[3]), atol=1e-10
    )


def test_prismatic_chain():
    spec = models.manip_scara()
    q = jnp.array([0.3, -0.5, 0.1])
    qd = jnp.array([1.0, -1.0, 0.5])
    M = kte.mass_matrix(spec, q)
    assert M.shape == (3, 3)
    # prismatic z joint: M[2,2] = total carried mass
    np.testing.assert_allclose(M[2, 2], 0.8, atol=1e-10)
    qdd = kte.forward_dynamics(spec, q, qd)
    # z acceleration = -g (free fall of the vertical axis, no spring)
    np.testing.assert_allclose(qdd[2], -9.81, atol=1e-9)


@pytest.mark.slow  # compile-heavy on XLA-CPU; covered by cheaper siblings in the default run
def test_scan_fk_matches_unrolled():
    """The scan-form FK/Jacobian path (long chains) must agree with the
    unrolled sweep bit-for-bit in semantics (mixed rev/prismatic, offsets)."""
    from reak_tpu.kte import dynamics as dyn
    from reak_tpu.kte.spec import ChainSpec, REVOLUTE, PRISMATIC, FIXED

    rng = np.random.default_rng(3)
    n = 10
    types = [REVOLUTE, PRISMATIC, REVOLUTE, FIXED, REVOLUTE,
             PRISMATIC, REVOLUTE, REVOLUTE, FIXED, REVOLUTE]
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    offs = rng.normal(size=(n, 3)) * 0.3
    com = rng.normal(size=(n, 3)) * 0.1
    inert = np.tile(np.eye(3) * 1e-2, (n, 1, 1))
    spec = ChainSpec.build(
        joint_types=types, axes=axes, offsets_pos=offs, com_pos=com,
        masses=rng.uniform(0.5, 2.0, n), inertias=inert,
    )
    nv = spec.nv
    q = jnp.asarray(rng.normal(size=nv) * 0.5)
    qd = jnp.asarray(rng.normal(size=nv))

    r_scan = dyn._fk_scan(spec, q)     # forced scan path
    # force the unrolled path by calling through a spec below the threshold:
    # replicate by slicing is invasive — instead compare against the generic
    # column loop on the same FkResult plus an independent unrolled FK.
    dtype = q.dtype
    c = dyn._spec_const(spec, dtype)
    import reak_tpu.math.rotations as rot2
    p = jnp.zeros(3, dtype)
    Q = rot2.qidentity(dtype)
    ref_pos = []
    from reak_tpu.kte.spec import JointType
    for i, jt in enumerate(spec.joint_types):
        jt = JointType(jt)
        p = p + rot2.qrot(Q, c["off_pos"][i])
        Q = rot2.qmul(Q, c["off_quat"][i])
        qidx = spec.q_index(i)
        if jt == REVOLUTE:
            Q = rot2.qmul(Q, rot2.q_from_axis_angle(c["axes"][i], q[qidx]))
        elif jt == PRISMATIC:
            p = p + q[qidx] * rot2.qrot(Q, c["axes"][i])
        ref_pos.append(p)
    np.testing.assert_allclose(np.asarray(r_scan.body_pos),
                               np.asarray(jnp.stack(ref_pos)), atol=1e-12)

    # dynamics terms agree between dispatch paths (scan kicks in at n>=8)
    M, f = dyn.dynamics_terms(spec, q, qd)
    # brute-force mass matrix from energy: M = d²T/dqd²
    def kinetic(qdd_):
        Jv, Jw = dyn.jacobians(spec, q)
        v = Jv @ qdd_
        w = Jw @ qdd_
        mass = jnp.asarray(np.asarray(spec.masses), dtype)
        It = jnp.asarray(np.asarray(spec.inertias).reshape(-1, 3, 3), dtype)
        return 0.5 * jnp.sum(mass * jnp.sum(v * v, -1)) + 0.5 * jnp.einsum(
            "bi,bij,bj->", w, It, w)
    M_e = jax.hessian(kinetic)(qd)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_e), atol=1e-9)
    assert bool(jnp.all(jnp.isfinite(f)))

"""Vehicle state-space systems + augmented/two-stage filters + predictor.

Mirrors the reference's simulation-as-oracle strategy (SURVEY.md §4):
conservation laws for the invariant mid-point satellite step, equilibrium
checks for airship/quadrotor, Monte-Carlo-free convergence checks for the
estimators (fixed seeds).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.ctrl import ss_systems as ss
from reak_tpu.ctrl.belief import GaussianBelief
from reak_tpu.ctrl import aug_kalman, predictor
from reak_tpu.ctrl.invariant import iekf_step
from reak_tpu.math import rotations as rot


def _tumbling_state():
    x = ss.default_state()
    return x.at[10:13].set(jnp.array([0.3, -1.1, 0.7]))


class TestSatellite:
    def test_imdt_quat_norm_and_energy(self):
        """Torque-free tumble: invariant mid-point keeps |q|=1 exactly and
        rotational kinetic energy to high accuracy over 2000 steps."""
        J = jnp.diag(jnp.array([0.8, 1.0, 1.3]))
        p = ss.satellite3D(mass=2.0, inertia=J)
        F = ss.satellite3D_imdt(p, 0.01)
        u = jnp.zeros(6)

        def step(x, _):
            return F(x, u), None

        x0 = _tumbling_state()
        xN, _ = jax.lax.scan(step, x0, None, length=2000)
        assert abs(float(jnp.linalg.norm(xN[3:7])) - 1.0) < 1e-12
        E0 = 0.5 * float(x0[10:13] @ J @ x0[10:13])
        EN = 0.5 * float(xN[10:13] @ J @ xN[10:13])
        assert abs(EN - E0) / E0 < 1e-4
        # angular momentum in *global* frame is conserved for torque-free body
        L0 = rot.qrot(x0[3:7], J @ x0[10:13])
        LN = rot.qrot(xN[3:7], J @ xN[10:13])
        np.testing.assert_allclose(np.asarray(LN), np.asarray(L0), atol=2e-3)

    def test_imdt_matches_rk4_small_dt(self):
        p = ss.satellite3D(mass=1.5, inertia=jnp.diag(jnp.array([0.5, 0.7, 0.9])))
        u = jnp.array([0.1, -0.2, 0.3, 0.02, 0.01, -0.03])
        x0 = _tumbling_state()
        x_im = ss.satellite3D_imdt(p, 1e-3)(x0, u)
        x_rk = ss.rk4_quat_discrete(ss.satellite3D_cont(p), 1e-3)(x0, u)
        np.testing.assert_allclose(np.asarray(x_im), np.asarray(x_rk),
                                   atol=1e-8)

    @pytest.mark.slow
    def test_iekf_pose_estimation_converges(self):
        """Simulation-as-oracle: IEKF with pose+gyro measurements recovers a
        tumbling satellite's state (ref: estimate_satellite3D.cpp workflow)."""
        key = jax.random.PRNGKey(0)
        J = jnp.diag(jnp.array([0.9, 1.1, 1.0]))
        p = ss.satellite3D(mass=1.0, inertia=J)
        dt = 0.05
        F = ss.satellite3D_imdt(p, dt)
        ret = ss.sat3D_retraction()
        u = jnp.zeros(6)

        # truth rollout
        xs = [_tumbling_state()]
        for _ in range(120):
            xs.append(F(xs[-1], u))
        xs = jnp.stack(xs)

        Q = jnp.eye(12) * 1e-6
        R = jnp.eye(9) * 1e-4
        h = ss.h_pose_gyro

        def diff(z, y):
            return ss.pose_innovation(z, y)

        # wrong initial belief
        b = GaussianBelief(ss.default_state().at[10:13].set(0.0),
                           jnp.eye(12) * 1.0)
        keys = jax.random.split(key, 120)
        for k in range(120):
            z = h(xs[k + 1])
            noise = 0.01 * jax.random.normal(keys[k], (9,))
            z = z.at[0:3].add(noise[0:3]).at[7:10].add(noise[6:9] * 0.1)
            zq = rot.qnormalize(rot.qmul(z[3:7], rot.q_exp(0.01 * noise[3:6])))
            z = z.at[3:7].set(zq)
            b = iekf_step(F, h, ret, b, u, z, Q, R, diff=diff)
        err_p = float(jnp.linalg.norm(b.mean[0:3] - xs[-1][0:3]))
        err_w = float(jnp.linalg.norm(b.mean[10:13] - xs[-1][10:13]))
        assert err_p < 0.05
        assert err_w < 0.05


class TestAirship:
    def test_neutral_buoyancy_equilibrium(self):
        p = ss.airship3D(mass=2.0, inertia=jnp.eye(3) * 0.5)
        f = ss.airship3D_cont(p)
        xdot = f(ss.default_state(), jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(xdot), 0.0, atol=1e-12)

    @pytest.mark.slow  # compile-heavy on XLA-CPU; covered by cheaper siblings in the default run
    def test_heavy_airship_sinks_with_drag_terminal_velocity(self):
        m, g = 2.0, 9.81
        p = ss.airship3D(mass=m, buoyancy=m * g - 1.0, drag_lin=0.5, gravity=g)
        f = ss.airship3D_cont(p)
        F = ss.rk4_quat_discrete(f, 0.05)
        x = ss.default_state()
        for _ in range(2000):
            x = F(x, jnp.zeros(6))
        # terminal velocity: drag_lin * v = 1.0 N downward
        assert abs(float(x[9]) + 1.0 / 0.5) < 1e-3

    def test_eccentricity_produces_pendulum_torque(self):
        p = ss.airship3D(mass=1.0, r_cm=(0.1, 0.0, -0.05))
        f = ss.airship3D_cont(p)
        xdot = f(ss.default_state(), jnp.zeros(6))
        # gravity at offset CM → pitch/roll angular acceleration
        assert float(jnp.linalg.norm(xdot[10:13])) > 1e-3

    def test_augmented_states_are_constant(self):
        p = ss.airship3D(mass=1.0)
        f = ss.airship3D_aug_cont(p)
        x = jnp.concatenate([ss.default_state(),
                             jnp.array([0.1, 0.01, 0.0, 0.0, -0.2])])
        xdot = f(x, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(xdot[13:]), 0.0)

    def test_aug_mass_changes_buoyant_accel(self):
        p = ss.airship3D(mass=1.0)
        f = ss.airship3D_aug_cont(p)
        x = jnp.concatenate([ss.default_state(), jnp.zeros(5)])
        x_heavy = x.at[13].set(0.2)  # δm = +0.2 kg → sinks
        assert float(f(x, jnp.zeros(6))[9]) == pytest.approx(0.0, abs=1e-12)
        assert float(f(x_heavy, jnp.zeros(6))[9]) < -1.0


class TestQuadrotor:
    def test_hover(self):
        p = ss.quadrotor(mass=1.2)
        f = ss.quadrotor_cont(p)
        u = jnp.full(4, ss.hover_thrust(p))
        xdot = f(ss.default_state(), u)
        np.testing.assert_allclose(np.asarray(xdot), 0.0, atol=1e-12)

    def test_differential_thrust_rolls(self):
        p = ss.quadrotor()
        f = ss.quadrotor_cont(p)
        uh = ss.hover_thrust(p)
        u = jnp.array([uh + 0.1, uh - 0.1, uh - 0.1, uh + 0.1])
        xdot = f(ss.default_state(), u)
        assert abs(float(xdot[10])) > 1e-2      # roll accel
        assert abs(float(xdot[11])) < 1e-9      # no pitch
        assert abs(float(xdot[12])) < 1e-9      # no yaw


class TestTSOS:
    def test_tsos_matches_joint_kf_linear(self):
        """On a linear-Gaussian augmented system, the two-stage filter must
        equal the joint augmented KF (Friedland equivalence)."""
        rng = np.random.default_rng(3)
        n_s, n_a, n_z = 3, 2, 2
        A = jnp.asarray(np.eye(n_s) + 0.05 * rng.standard_normal((n_s, n_s)))
        Ba = jnp.asarray(0.3 * rng.standard_normal((n_s, n_a)))
        C = jnp.asarray(rng.standard_normal((n_z, n_s)))
        Da = jnp.asarray(0.2 * rng.standard_normal((n_z, n_a)))

        def F(s, a, u, t=0.0):
            return A @ s + Ba @ a + u

        def h(s, a, t=0.0):
            return C @ s + Da @ a

        def F_joint(x, u, t=0.0):
            return jnp.concatenate([F(x[:n_s], x[n_s:], u, t), x[n_s:]])

        def h_joint(x, t=0.0):
            return h(x[:n_s], x[n_s:], t)

        Q = jnp.diag(jnp.concatenate([jnp.full(n_s, 1e-3), jnp.full(n_a, 1e-6)]))
        R = jnp.eye(n_z) * 1e-2

        from reak_tpu.ctrl.kalman import ekf_step
        b_joint = GaussianBelief(jnp.zeros(n_s + n_a), jnp.eye(n_s + n_a))
        b_tsos = aug_kalman.tsos_init(jnp.zeros(n_s), jnp.eye(n_s),
                                      jnp.zeros(n_a), jnp.eye(n_a))
        for k in range(15):
            u = jnp.asarray(rng.standard_normal(n_s) * 0.1)
            z = jnp.asarray(rng.standard_normal(n_z))
            b_joint = ekf_step(F_joint, h_joint, b_joint, u, z, Q, R)
            b_tsos = aug_kalman.tsos_step(F, h, b_tsos, u, z, Q, R)
        re = aug_kalman.tsos_joint_belief(b_tsos)
        np.testing.assert_allclose(np.asarray(re.mean),
                                   np.asarray(b_joint.mean), atol=1e-8)
        np.testing.assert_allclose(np.asarray(re.cov),
                                   np.asarray(b_joint.cov), atol=1e-7)

    @pytest.mark.slow
    def test_tsos_estimates_airship_mass_imbalance(self):
        """Online parameter identification: heavy airship, TSOS recovers δm."""
        g = 9.81
        p_true = ss.airship3D(mass=1.0, drag_lin=0.3, gravity=g)
        dm_true = 0.15
        dt = 0.05
        f_aug = ss.airship3D_aug_cont(p_true)
        F_aug = ss.rk4_quat_discrete(f_aug, dt)

        def F2(s, a, u, t=0.0):
            aug = jnp.concatenate([a, jnp.zeros(4)])  # only δm estimated
            return F_aug(jnp.concatenate([s, aug]), u, t)[:13]

        def h2(s, a, t=0.0):
            return ss.h_pose_gyro(s)[jnp.array([0, 1, 2, 7, 8, 9])]  # p + w... (gyro idx)

        # truth
        x = jnp.concatenate([ss.default_state(),
                             jnp.array([dm_true, 0, 0, 0, 0.0])])
        Q = jnp.zeros((14, 14)).at[:13, :13].set(jnp.eye(13) * 1e-8)
        Q = Q.at[13, 13].set(1e-6)
        R = jnp.eye(6) * 1e-6
        b = aug_kalman.tsos_init(ss.default_state(), jnp.eye(13) * 1e-2,
                                 jnp.zeros(1), jnp.eye(1) * 0.1)
        u = jnp.zeros(6)
        for k in range(80):
            x = F_aug(x, u)
            z = h2(x[:13], None)
            b = aug_kalman.tsos_step(F2, h2, b, u, z, Q, R)
        assert abs(float(b.a[0]) - dm_true) < 0.02


class TestPredictor:
    def test_predicted_trajectory_covariance_grows_and_queries(self):
        p = ss.satellite3D(inertia=jnp.diag(jnp.array([0.8, 1.0, 1.2])))
        F = ss.satellite3D_imdt(p, 0.1)
        ret = ss.sat3D_retraction()
        b0 = GaussianBelief(_tumbling_state(), jnp.eye(12) * 1e-4)
        us = jnp.zeros((20, 6))
        traj = predictor.predict_belief_trajectory(F, ret, b0, us,
                                                   jnp.eye(12) * 1e-5, 0.1)
        assert traj.means.shape == (21, 13)
        tr0 = float(jnp.trace(traj.covs[0]))
        trN = float(jnp.trace(traj.covs[-1]))
        assert trN > tr0
        bq = traj.at_time(0.55)
        np.testing.assert_allclose(
            np.asarray(bq.mean),
            np.asarray(0.5 * (traj.means[5] + traj.means[6])), atol=1e-12)

    def test_scenario_sampling_on_manifold(self):
        p = ss.satellite3D()
        F = ss.satellite3D_imdt(p, 0.1)
        ret = ss.sat3D_retraction()
        b0 = GaussianBelief(ss.default_state(), jnp.eye(12) * 1e-3)
        traj = predictor.predict_belief_trajectory(
            F, ret, b0, jnp.zeros((10, 6)), jnp.eye(12) * 1e-4, 0.1)
        scen = predictor.sample_scenarios(jax.random.PRNGKey(1), traj, 16,
                                          ret=ret)
        assert scen.shape == (16, 11, 13)
        qn = jnp.linalg.norm(scen[..., 3:7], axis=-1)
        np.testing.assert_allclose(np.asarray(qn), 1.0, atol=1e-9)

"""KTE element parity: backlash deadband, flexible beam, VMC/task forces
(ref: joint_backlash.hpp:47, flexible_beam.hpp:52, vmc_revolute_joint.hpp:58,
force_actuator.hpp:55, line/plane_point_mindist.hpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.kte import ChainSpec, REVOLUTE, dynamics, models, forces


class TestBacklash:
    def _spec(self, gap):
        return ChainSpec.build(
            joint_types=[REVOLUTE],
            axes=[[0, 0, 1.0]],
            com_pos=[[0.5, 0, 0]],
            masses=[1.0],
            inertias=np.eye(3)[None] * 1e-3,
            stiffness=[10.0],
            backlash=[gap],
            gravity=(0.0, 0.0, 0.0),
        )

    def test_no_force_inside_deadband(self):
        spec = self._spec(0.2)
        tau = dynamics.bias_force(spec, jnp.array([0.05]), jnp.zeros(1))
        assert abs(float(tau[0])) < 1e-12

    def test_spring_engages_outside_deadband(self):
        spec = self._spec(0.2)
        tau = dynamics.bias_force(spec, jnp.array([0.3]), jnp.zeros(1))
        # engaged displacement = 0.3 − 0.1 = 0.2 → force = −k·0.2
        assert float(tau[0]) == pytest.approx(-10.0 * 0.2, rel=1e-9)

    def test_zero_gap_matches_plain_spring(self):
        s0 = self._spec(0.0)
        tau = dynamics.bias_force(s0, jnp.array([0.3]), jnp.zeros(1))
        assert float(tau[0]) == pytest.approx(-3.0, rel=1e-9)


class TestFlexibleBeam:
    def test_static_tip_deflection_converges_to_euler_bernoulli(self):
        """Self-weight cantilever: tip deflection → qL⁴/(8EI) at O(1/n²)
        (midpoint pseudo-joint placement; ref flexible_beam.hpp:52)."""
        from reak_tpu.math import rotations as rot

        L, m, EI, g = 1.0, 0.5, 30.0, 9.81
        analytic = (m * g / L) * L**4 / (8 * EI)

        def tip_deflection(n):
            spec = models.flexible_beam(n_segments=n, length=L, mass=m, EI=EI,
                                        gravity=g)
            stiff = jnp.asarray(np.asarray(spec.stiffness))
            h = L / n

            @jax.jit
            def solve_static(q0):
                # fixed point of k q* = τ_gravity(q*) (geometric nonlinearity
                # is a contraction at these deflections)
                def step(q, _):
                    tau_g = dynamics.bias_force(spec, q, jnp.zeros(n)) \
                        + stiff * q  # undo the spring part → gravity torque
                    return tau_g / stiff, None
                q, _ = jax.lax.scan(step, q0, None, length=25)
                r = dynamics.fk(spec, q)
                tip = r.body_pos[-1] + rot.qrot(
                    r.body_quat[-1], jnp.array([h / 2, 0.0, 0.0]))
                return -tip[2]

            return float(solve_static(jnp.zeros(n)))

        d8 = tip_deflection(8)
        d16 = tip_deflection(16)
        assert abs(d16 - analytic) / analytic < 0.05
        assert abs(d16 - analytic) <= abs(d8 - analytic) + 1e-9

    @pytest.mark.slow  # compile-heavy on XLA-CPU; covered by cheaper siblings in the default run
    def test_beam_oscillates_and_damps(self):
        """Release a bent beam: stays finite and rings down (stiff dynamics
        via the linearly-implicit stepper, systems.semi_implicit_kte)."""
        spec = models.flexible_beam(n_segments=6, length=0.8, mass=0.3,
                                    EI=20.0, gravity=0.0)
        n = 6
        q0 = jnp.full(n, 0.1)  # bent, then released

        from reak_tpu.ctrl import systems
        F = systems.semi_implicit_kte(spec, 1e-3)

        @jax.jit
        def roll(x0):
            def step(x, _):
                return F(x, jnp.zeros(n)), x[:n]
            return jax.lax.scan(step, x0, None, length=3000)[1]

        qs = roll(jnp.concatenate([q0, jnp.zeros(n)]))
        assert bool(jnp.all(jnp.isfinite(qs)))
        # it oscillates (sign changes at the tip joint) …
        tip = np.asarray(qs[:, -1])
        assert int(np.sum(np.abs(np.diff(np.sign(tip))) > 0)) >= 4
        # … and material damping rings it down
        assert float(jnp.abs(qs[-1]).max()) < 0.02
        assert float(jnp.abs(qs[-1]).max()) < 0.2 * float(jnp.abs(qs[0]).max())


class TestTaskForces:
    def _arm(self):
        return models.planar_2link()

    def test_world_force_to_tau_matches_autodiff(self):
        """τ = Jᵀf must equal ∂(f·p)/∂q (virtual work)."""
        spec = self._arm()
        q = jnp.array([0.4, -0.3])
        f = jnp.array([1.0, 2.0, 0.5])
        pt = jnp.array([0.1, 0.0, 0.0])
        tau = forces.world_force_to_tau(spec, q, body=1, point_local=pt,
                                        f_world=f)

        def work(qq):
            r = dynamics.fk(spec, qq)
            from reak_tpu.math import rotations as rot
            p = r.body_pos[1] + rot.qrot(r.body_quat[1], pt)
            return jnp.dot(f, p)

        tau_ad = jax.grad(work)(q)
        np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ad),
                                   atol=1e-10)

    def test_virtual_spring_pulls_toward_target(self):
        """VMC: simulate with the virtual spring; the end point converges to
        the target (ref: vmc_revolute_joint / virtual_kte_interface)."""
        spec = models.planar_2link(gravity=0.0)  # isolate the virtual force
        n = 2
        # pick a reachable target from a known configuration
        q_ref = jnp.array([0.5, -0.4])
        r = dynamics.fk(spec, q_ref)
        target = np.asarray(r.body_pos[1])

        from reak_tpu.ctrl import systems

        def f_cont(x, u, t=0.0):
            q, qd = x[:n], x[n:]
            tau = forces.virtual_spring_damper(spec, q, qd, body=1,
                                               point_local=jnp.zeros(3),
                                               target_world=jnp.asarray(target),
                                               k=30.0, d=8.0)
            qdd = dynamics.forward_dynamics(spec, q, qd, tau)
            return jnp.concatenate([qd, qdd])

        F = systems.rk4_discrete(f_cont, 5e-3)

        @jax.jit
        def roll(x0):
            def step(x, _):
                return F(x, jnp.zeros(n)), None
            return jax.lax.scan(step, x0, None, length=4000)[0]

        xN = roll(jnp.zeros(2 * n))
        rN = dynamics.fk(spec, xN[:n])
        err = float(jnp.linalg.norm(rN.body_pos[1] - jnp.asarray(target)))
        assert err < 0.05

    def test_plane_constraint_force_restores(self):
        spec = self._arm()
        q = jnp.array([0.3, 0.2])
        tau = forces.plane_point_mindist_force(
            spec, q, body=1, point_local=jnp.zeros(3),
            plane_normal=jnp.array([0.0, 1.0, 0.0]), plane_offset=0.0,
            k=5.0)
        # moving along +y must be resisted: τ·q̇ through J gives negative power
        r = dynamics.fk(spec, q)
        assert tau.shape == (2,)
        assert bool(jnp.any(jnp.abs(tau) > 1e-9))


class TestFloatingFlexible:
    """Free-flying hub + stiff flexible appendage on the IMEX stepper —
    the free-base extension of semi_implicit_kte (round 5; ref
    flexible_beam.hpp elements on free_joints.hpp:165)."""

    def _spec(self):
        from reak_tpu.kte import models
        return models.floating_flexible_beam(n_segments=3, EI=200.0,
                                             rayleigh_beta=0.01)

    def test_imex_matches_rk4_at_small_dt(self):
        from reak_tpu.kte import models
        from reak_tpu.ctrl import systems
        spec = self._spec()
        nq, nv = spec.nq, spec.nv
        x = jnp.zeros(nq + nv).at[3].set(1.0)
        x = x.at[nq + 3].set(0.2)              # base angular rate
        x = x.at[nq + 6].set(0.5)              # bend the first beam joint
        F_im = jax.jit(systems.semi_implicit_kte(spec, 1e-4))
        F_rk = jax.jit(systems.kte_discrete(spec, 1e-4))
        xi, xr = x, x
        for _ in range(50):
            xi = F_im(xi, jnp.zeros(nv))
            xr = F_rk(xr, jnp.zeros(nv))
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xr),
                                   rtol=2e-3, atol=2e-4)

    def test_imex_stable_where_rk4_explodes(self):
        from reak_tpu.ctrl import systems
        spec = self._spec()
        nq, nv = spec.nq, spec.nv
        x0 = jnp.zeros(nq + nv).at[3].set(1.0).at[nq + 6].set(0.8)
        dt = 5e-2                               # far beyond RK4 stability
        F_im = jax.jit(systems.semi_implicit_kte(spec, dt))
        F_rk = jax.jit(systems.kte_discrete(spec, dt))
        xi, xr = x0, x0
        for _ in range(200):
            xi = F_im(xi, jnp.zeros(nv))
            xr = F_rk(xr, jnp.zeros(nv))
        assert not bool(jnp.all(jnp.isfinite(xr))) or \
            float(jnp.max(jnp.abs(xr))) > 1e3   # explicit path blows up
        assert bool(jnp.all(jnp.isfinite(xi)))
        # quaternion stays unit through the manifold advance
        assert abs(float(jnp.linalg.norm(xi[3:7])) - 1.0) < 1e-10
        # Rayleigh damping dissipates the elastic energy: beam coordinates
        # settle toward rest
        assert float(jnp.max(jnp.abs(xi[7:nq]))) < 0.2

    def test_momentum_conserved_without_springs_forcing_base(self):
        """Zero gravity, no inputs: total linear momentum of the floating
        system is conserved by the IMEX map (free dofs carry no passive
        elements; internal spring forces cancel pairwise)."""
        from reak_tpu.kte import dynamics
        from reak_tpu.ctrl import systems
        spec = self._spec()
        nq, nv = spec.nq, spec.nv

        def momentum(x):
            q, v = x[:nq], x[nq:]
            Jv, _ = dynamics.jacobians(spec, q)
            masses = jnp.asarray(np.asarray(spec.masses))
            vel = Jv @ v
            return jnp.sum(masses[:, None] * vel, axis=0)

        x = jnp.zeros(nq + nv).at[3].set(1.0)
        x = x.at[nq + 0].set(0.1).at[nq + 4].set(0.15).at[nq + 6].set(0.6)
        F = jax.jit(systems.semi_implicit_kte(spec, 2e-3))
        p0 = momentum(x)
        for _ in range(300):
            x = F(x, jnp.zeros(nv))
        p1 = momentum(x)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=5e-3)

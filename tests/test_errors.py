"""Failure-detection surface tests (SURVEY §5.3; ref: singularity_error at
manipulator_model.cpp:351-354, integration_exceptions.hpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu import errors
from reak_tpu.kte import models, dynamics
from reak_tpu.ctrl import mpc


class TestFlags:
    def test_finite_flag(self):
        assert int(errors.finite_flag(jnp.ones(3))) == errors.OK
        assert int(errors.finite_flag(jnp.array([1.0, jnp.nan]))) == errors.NONFINITE
        assert int(errors.finite_flag(jnp.ones(2), jnp.array([jnp.inf]))) == errors.NONFINITE

    def test_chol_singular_flag(self):
        assert int(errors.chol_singular_flag(jnp.eye(3))) == errors.OK
        sing = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
        assert int(errors.chol_singular_flag(sing)) == errors.SINGULAR_MATRIX

    def test_describe_and_raise(self):
        assert errors.describe(errors.OK) == "ok"
        assert "singular" in errors.describe(errors.SINGULAR_MATRIX | errors.NONFINITE)
        errors.raise_on_error(jnp.asarray(errors.OK))
        with pytest.raises(errors.SingularityError):
            errors.raise_on_error(errors.SINGULAR_MATRIX)
        with pytest.raises(errors.NonFiniteError):
            errors.raise_on_error(errors.NONFINITE)
        with pytest.raises(errors.NotConvergedError):
            errors.raise_on_error(jnp.array([errors.OK, errors.NOT_CONVERGED]))


class TestCheckedDynamics:
    def test_ok_on_healthy_chain(self):
        spec = models.planar_2link()
        qdd, status = jax.jit(
            lambda q, qd: dynamics.forward_dynamics_checked(spec, q, qd)
        )(jnp.array([0.3, -0.2]), jnp.array([0.1, 0.0]))
        assert int(status) == errors.OK
        qdd_ref = dynamics.forward_dynamics(spec, jnp.array([0.3, -0.2]),
                                            jnp.array([0.1, 0.0]))
        np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_ref))

    def test_flags_nonfinite_state(self):
        spec = models.planar_2link()
        _, status = dynamics.forward_dynamics_checked(
            spec, jnp.array([jnp.nan, 0.0]), jnp.zeros(2))
        assert int(status) & errors.NONFINITE

    def test_flags_singular_mass(self):
        # a zero-mass chain has a singular mass matrix — the case the
        # reference throws singularity_error on (manipulator_model.cpp:351)
        spec = models.planar_2link(m1=0.0, m2=0.0)
        _, status = dynamics.forward_dynamics_checked(
            spec, jnp.zeros(2), jnp.zeros(2))
        assert int(status) & errors.SINGULAR_MATRIX
        with pytest.raises(errors.SingularityError):
            errors.raise_on_error(status)

    def test_vmapped_flags_localize_bad_scenarios(self):
        spec = models.planar_2link()
        qs = jnp.array([[0.1, 0.2], [jnp.nan, 0.0], [0.4, -0.1]])
        _, status = jax.vmap(
            lambda q: dynamics.forward_dynamics_checked(spec, q, jnp.zeros(2))
        )(qs)
        assert status.shape == (3,)
        assert int(status[0]) == errors.OK and int(status[2]) == errors.OK
        assert int(status[1]) & errors.NONFINITE


class TestMPCStatus:
    def test_solution_status_converged(self):
        A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
        B = jnp.array([[0.0], [0.1]])
        F = lambda x, u: A @ x + B @ u
        prob = mpc.MPCProblem(Q=jnp.eye(2), R=jnp.eye(1) * 0.1, QN=jnp.eye(2),
                              u_min=jnp.array([-5.0]), u_max=jnp.array([5.0]),
                              horizon=10)
        sol = mpc.solve(F, prob, jnp.array([1.0, 0.0]), qp_iters=30)
        assert int(mpc.solution_status(sol)) == errors.OK
        # artificially poison the plan → NONFINITE
        bad = sol._replace(u=sol.u.at[0, 0].set(jnp.nan))
        assert int(mpc.solution_status(bad)) & errors.NONFINITE
        # an unconverged gap flags NOT_CONVERGED
        loose = sol._replace(qp=sol.qp._replace(gap=jnp.asarray(1e-2)))
        assert int(mpc.solution_status(loose)) & errors.NOT_CONVERGED

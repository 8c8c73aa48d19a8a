"""Integrator accuracy/convergence tests
(parity model: ref core/integrators/unit_test_integrators.cpp — tolerance
checks against known IVP solutions)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu import integrators as ig


def exp_decay(t, y):
    return -y


def oscillator(t, y):
    # y = [x, v], x'' = -x
    return jnp.stack([y[1], -y[0]])


def test_fixed_steppers_accuracy():
    y0 = jnp.array([1.0])
    for method, tol in [("euler", 5e-3), ("midpoint", 1e-5), ("rk4", 1e-10), ("rk5", 1e-11)]:
        y = ig.integrate(exp_decay, y0, 0.0, 0.01, 100, method=method)
        np.testing.assert_allclose(y[0], np.exp(-1.0), atol=tol)


def test_order_of_convergence_rk4():
    y0 = jnp.array([1.0, 0.0])
    errs = []
    for n in [25, 50, 100]:
        y = ig.integrate(oscillator, y0, 0.0, 1.0 / n, n, method="rk4")
        errs.append(abs(float(y[0]) - np.cos(1.0)))
    # 4th order: halving dt reduces error ~16x
    assert errs[0] / errs[1] > 10
    assert errs[1] / errs[2] > 10


def test_rollout_shape():
    ys = ig.rollout(oscillator, jnp.array([1.0, 0.0]), 0.0, 0.1, 50)
    assert ys.shape == (50, 2)
    np.testing.assert_allclose(ys[-1, 0], np.cos(5.0), atol=1e-4)


def test_adaptive_dopri45():
    res = ig.integrate_adaptive(
        oscillator, jnp.array([1.0, 0.0]), 0.0, 10.0, 0.1, tol=1e-10
    )
    assert bool(res.ok)
    np.testing.assert_allclose(res.y[0], np.cos(10.0), atol=1e-7)
    np.testing.assert_allclose(res.y[1], -np.sin(10.0), atol=1e-7)


def test_adaptive_rkf45():
    res = ig.integrate_adaptive(
        exp_decay, jnp.array([1.0]), 0.0, 2.0, 0.5, tol=1e-9, method="rkf45"
    )
    assert bool(res.ok)
    np.testing.assert_allclose(res.y[0], np.exp(-2.0), atol=1e-7)


def test_adaptive_step_budget_failure():
    res = ig.integrate_adaptive(
        oscillator, jnp.array([1.0, 0.0]), 0.0, 1000.0, 0.1, tol=1e-12, max_steps=10
    )
    assert not bool(res.ok)


def test_adaptive_stiff_decay():
    # moderately stiff linear problem: y' = -50(y - cos t)
    def f(t, y):
        return -50.0 * (y - jnp.cos(t))

    res = ig.integrate_adaptive(f, jnp.array([0.0]), 0.0, 1.5, 0.01, tol=1e-8)
    assert bool(res.ok)
    # exact: y = (50/2501)(50 cos t + sin t) - (2500/2501) e^{-50t}
    t = 1.5
    exact = 50 / 2501 * (50 * np.cos(t) + np.sin(t)) - 2500 / 2501 * np.exp(-50 * t)
    np.testing.assert_allclose(res.y[0], exact, atol=1e-6)


def test_multistep_methods():
    y0 = jnp.array([1.0, 0.0])
    for fn, tol in [
        (ig.adams_bm3, 1e-5),
        (ig.adams_bm5, 1e-8),
        (ig.hamming_mod, 1e-5),
        (lambda *a: ig.hamming_iter_mod(*a, iters=3), 1e-5),
    ]:
        y = fn(oscillator, y0, 0.0, 0.01, 100)
        np.testing.assert_allclose(y[0], np.cos(1.0), atol=tol)
        np.testing.assert_allclose(y[1], -np.sin(1.0), atol=tol)


def test_multistep_short_runs():
    # fewer steps than the bootstrap window
    y0 = jnp.array([1.0])
    y = ig.adams_bm5(exp_decay, y0, 0.0, 0.1, 2)
    np.testing.assert_allclose(y[0], np.exp(-0.2), atol=1e-6)


def test_pytree_state():
    # steppers must accept arbitrary pytrees
    y0 = {"a": jnp.array([1.0]), "b": jnp.array([0.0, 1.0])}

    def f(t, y):
        return {"a": -y["a"], "b": jnp.stack([y["b"][1], -y["b"][0]])}

    y = ig.integrate(f, y0, 0.0, 0.01, 100, method="rk4")
    np.testing.assert_allclose(y["a"][0], np.exp(-1.0), atol=1e-9)
    np.testing.assert_allclose(y["b"][0], np.sin(1.0), atol=1e-9)


def test_kte_rollout_integration():
    """End-to-end: pendulum chain + RK4 scan (the test_am.cpp simulation loop)."""
    from reak_tpu import kte
    from reak_tpu.kte import models

    spec = models.pendulum(length=0.5, mass=1.0, motor_inertia=0.0, gravity=9.81)

    def f(t, y):
        return kte.state_rate(spec, y)

    y0 = jnp.array([0.05, 0.0])  # small angle about q=... (gravity eq at -pi/2)
    # linearize about hanging equilibrium q* = -pi/2: small oscillation ω² = g/L
    y0 = jnp.array([-np.pi / 2 + 0.01, 0.0])
    y = ig.integrate(f, y0, 0.0, 0.001, 1000, method="rk4")
    w = np.sqrt(9.81 / 0.5)
    expected = -np.pi / 2 + 0.01 * np.cos(w * 1.0)
    np.testing.assert_allclose(y[0], expected, atol=1e-5)

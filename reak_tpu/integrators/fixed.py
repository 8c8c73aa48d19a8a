"""Fixed-step integrators (ref: core/integrators/fixed_step_integrators.hpp:61-307).

Steppers take ``f(t, y) → ẏ`` (y any pytree) and are composed into rollouts via
``lax.scan``.  RK5 uses the 6-stage Butcher tableau of the reference's
``runge_kutta5_integrator`` (Fehlberg's 5th-order stages).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axpy(y, a, k):
    return jax.tree.map(lambda yy, kk: yy + a * kk, y, k)


def _lc(y, *coeff_k):
    """y + Σ aᵢ kᵢ over pytrees."""
    out = y
    for a, k in coeff_k:
        out = jax.tree.map(lambda oo, kk: oo + a * kk, out, k)
    return out


def euler_step(f, t, y, dt):
    """(ref: fixed_step_integrators.hpp:61 euler_integrator)"""
    return _axpy(y, dt, f(t, y))


def midpoint_step(f, t, y, dt):
    """(ref: fixed_step_integrators.hpp:133 midpoint_integrator)"""
    k1 = f(t, y)
    return _axpy(y, dt, f(t + 0.5 * dt, _axpy(y, 0.5 * dt, k1)))


def rk4_step(f, t, y, dt):
    """(ref: fixed_step_integrators.hpp:213 runge_kutta4_integrator)"""
    k1 = f(t, y)
    k2 = f(t + 0.5 * dt, _axpy(y, 0.5 * dt, k1))
    k3 = f(t + 0.5 * dt, _axpy(y, 0.5 * dt, k2))
    k4 = f(t + dt, _axpy(y, dt, k3))
    return jax.tree.map(
        lambda yy, a, b, c, d: yy + dt / 6.0 * (a + 2 * b + 2 * c + d), y, k1, k2, k3, k4
    )


def rk5_step(f, t, y, dt):
    """5th-order Runge-Kutta (Fehlberg stages, ref: fixed_step_integrators.hpp:307
    runge_kutta5_integrator)."""
    k1 = f(t, y)
    k2 = f(t + 0.25 * dt, _lc(y, (0.25 * dt, k1)))
    k3 = f(t + 0.375 * dt, _lc(y, (3 * dt / 32, k1), (9 * dt / 32, k2)))
    k4 = f(
        t + 12 / 13 * dt,
        _lc(y, (1932 * dt / 2197, k1), (-7200 * dt / 2197, k2), (7296 * dt / 2197, k3)),
    )
    k5 = f(
        t + dt,
        _lc(y, (439 * dt / 216, k1), (-8.0 * dt, k2), (3680 * dt / 513, k3), (-845 * dt / 4104, k4)),
    )
    k6 = f(
        t + 0.5 * dt,
        _lc(
            y,
            (-8 * dt / 27, k1),
            (2.0 * dt, k2),
            (-3544 * dt / 2565, k3),
            (1859 * dt / 4104, k4),
            (-11 * dt / 40, k5),
        ),
    )
    return _lc(
        y,
        (16 * dt / 135, k1),
        (6656 * dt / 12825, k3),
        (28561 * dt / 56430, k4),
        (-9 * dt / 50, k5),
        (2 * dt / 55, k6),
    )


STEPPERS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "rk4": rk4_step,
    "rk5": rk5_step,
}


def integrate(f, y0, t0, dt, n_steps: int, method="rk4", unroll: int = 1):
    """Integrate to t0 + n_steps·dt; returns final state
    (the ``integrator::integrate(aEndTime)`` contract, ref integrator.hpp:153)."""
    step = STEPPERS[method] if isinstance(method, str) else method

    def body(carry, i):
        t, y = carry
        y = step(f, t, y, dt)
        return (t + dt, y), None

    (tf, yf), _ = jax.lax.scan(body, (jnp.asarray(t0, dtype=jnp.result_type(float)), y0),
                               jnp.arange(n_steps), unroll=unroll)
    return yf


def rollout(f, y0, t0, dt, n_steps: int, method="rk4", unroll: int = 1):
    """Integrate and keep the whole trajectory: returns pytree stacked over time."""
    step = STEPPERS[method] if isinstance(method, str) else method

    def body(carry, i):
        t, y = carry
        y = step(f, t, y, dt)
        return (t + dt, y), y

    _, ys = jax.lax.scan(body, (jnp.asarray(t0, dtype=jnp.result_type(float)), y0),
                         jnp.arange(n_steps), unroll=unroll)
    return ys

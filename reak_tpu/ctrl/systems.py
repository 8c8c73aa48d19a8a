"""State-space systems: linearization, discretization, generic LTI/LTV types.

TPU-native replacement for the reference's concept-driven system templates
(ref: ctrl/ctrl_sys/state_space_sys_concept.hpp:112, discrete_sss_concept.hpp,
linear_ss_system_concept.hpp:189, lti_ss_system.hpp:54, lti_discrete_sys.hpp,
discretized_lti_sys.hpp:64, num_int_dtnl_system.hpp:55).

A "system" here is just a pair of pure functions; the concept checks collapse
into function signatures:

- continuous: ``f(x, u, t) → ẋ``
- discrete:   ``F(x, u, t) → x⁺``

Helpers produce linearizations (A, B) by forward-mode AD — replacing the
hand-written ``get_state_transition_blocks`` of each reference model — and
exact LTI discretization via the matrix exponential (the reference's
``discretized_lti_sys``).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.math.linalg import expm_pade


class LinearModel(NamedTuple):
    """x⁺ ≈ A x + B u + c  (or ẋ for continuous)."""

    A: jax.Array
    B: jax.Array
    c: jax.Array


def linearize(f: Callable, x, u, t=0.0) -> LinearModel:
    """Jacobian linearization of ``f(x, u, t)`` about (x, u) via jacfwd
    (replaces per-model hand Jacobians, e.g. satellite_basic_models.hpp
    get_state_transition_blocks)."""
    A = jax.jacfwd(lambda xx: f(xx, u, t))(x)
    B = jax.jacfwd(lambda uu: f(x, uu, t))(u)
    c = f(x, u, t) - A @ x - B @ u
    return LinearModel(A=A, B=B, c=c)


def discretize_lti(A, B, dt):
    """Exact zero-order-hold discretization via the augmented matrix exponential
    (ref: ctrl/ctrl_sys/discretized_lti_sys.hpp:64)."""
    n, m = A.shape[-1], B.shape[-1]
    dtype = A.dtype
    Z = jnp.zeros(A.shape[:-2] + (m, n + m), dtype)
    M = jnp.concatenate([jnp.concatenate([A, B], axis=-1), Z], axis=-2) * dt
    E = expm_pade(M)
    return E[..., :n, :n], E[..., :n, n:]


def rk4_discrete(f: Callable, dt: float) -> Callable:
    """Wrap a continuous system into a one-step discrete map with RK4
    (ref: ctrl/ctrl_sys/num_int_dtnl_system.hpp:55 num_int_dtnl_sys)."""

    def F(x, u, t=0.0):
        k1 = f(x, u, t)
        k2 = f(x + 0.5 * dt * k1, u, t + 0.5 * dt)
        k3 = f(x + 0.5 * dt * k2, u, t + 0.5 * dt)
        k4 = f(x + dt * k3, u, t + dt)
        return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    return F


def euler_discrete(f: Callable, dt: float) -> Callable:
    def F(x, u, t=0.0):
        return x + dt * f(x, u, t)

    return F


def lti_continuous(A, B) -> Callable:
    """ẋ = A x + B u (ref: lti_ss_system.hpp:54)."""

    def f(x, u, t=0.0):
        return A @ x + B @ u

    return f


def lti_discrete(A, B) -> Callable:
    """x⁺ = A x + B u (ref: lti_discrete_sys.hpp)."""

    def F(x, u, t=0.0):
        return A @ x + B @ u

    return F


def kte_continuous(spec, actuated=None) -> Callable:
    """Continuous system from a KTE chain: x = [q, qd], u = joint torques
    (ref: ctrl/ctrl_sys/kte_nl_system.hpp:67 kte_nl_system).

    ``actuated``: optional (nv, nu) selection matrix mapping inputs to
    generalized forces (defaults to identity — fully actuated).
    """
    from reak_tpu import kte as _kte

    def f(x, u, t=0.0):
        tau = u if actuated is None else actuated @ u
        return _kte.state_rate(spec, x, tau)

    return f

"""LQR / LQG controllers (ref: ctrl/ctrl_sys/lqr_controllers.hpp:58 IHDT_LQR,
:259 IHCT_LQR; LQG = LQR + steady-state Kalman gain by duality).

Thin layer over the ARE solvers in :mod:`reak_tpu.math.are`; finite-horizon
time-varying LQR comes from a Riccati scan (used for MPC warm starts and the
MEAQR planning topologies)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.math.are import dlqr, clqr, solve_dare, solve_care
from reak_tpu.math.linalg import solve_pd


class LQGGains(NamedTuple):
    K: jax.Array  # control gain, u = −K x̂
    L: jax.Array  # estimator gain
    P: jax.Array  # control cost-to-go
    S: jax.Array  # estimation error covariance


def dlqg(A, B, C, Q, R, W, V, iters: int = 30) -> LQGGains:
    """Discrete-time LQG: LQR gain + steady-state Kalman gain (dual DARE).

    W = process noise cov, V = measurement noise cov.
    """
    K, P = dlqr(A, B, Q, R, iters)
    # estimation DARE on the dual system (Aᵀ, Cᵀ)
    S = solve_dare(jnp.swapaxes(A, -1, -2), jnp.swapaxes(C, -1, -2), W, V, iters)
    L = (solve_pd(C @ S @ jnp.swapaxes(C, -1, -2) + V, C @ S)).T  # S Cᵀ (CSCᵀ+V)⁻¹
    return LQGGains(K=K, L=L, P=P, S=S)


def clqg(A, B, C, Q, R, W, V, iters: int = 40) -> LQGGains:
    """Continuous-time LQG (ref: lqr_controllers.hpp:259 + Kalman-Bucy dual)."""
    K, P = clqr(A, B, Q, R, iters)
    S = solve_care(jnp.swapaxes(A, -1, -2), jnp.swapaxes(C, -1, -2), W, V, iters)
    L = S @ jnp.swapaxes(C, -1, -2) @ jnp.linalg.inv(V)
    return LQGGains(K=K, L=L, P=P, S=S)


def finite_horizon_dlqr(A, B, Q, R, QN, horizon: int):
    """Time-varying LQR gains by backward Riccati scan; returns Ks (H, m, n)
    and cost-to-go P0.  (Feeds MPC warm starts and MEAQR topologies.)"""

    def body(P, _):
        Bt = jnp.swapaxes(B, -1, -2)
        K = solve_pd(R + Bt @ P @ B, Bt @ P @ A)
        AK = A - B @ K
        P1 = Q + jnp.swapaxes(K, -1, -2) @ R @ K + jnp.swapaxes(AK, -1, -2) @ P @ AK
        return P1, K

    P0, Ks = jax.lax.scan(body, QN, None, length=horizon)
    return Ks[::-1], P0

"""Spectral factorization (CTSF/DTSF) and infinite-horizon LQG solvers
(math/are.py) — factorization-identity tests vs the defining Riccati
equations + closed-loop/filter stability (ref: mat_are_solver.hpp:2624,
2754, 2136, 2606)."""
import jax.numpy as jnp
import numpy as np

from reak_tpu.math.are import (solve_ctsf, solve_dtsf, solve_ihct_lqg,
                               solve_ihdt_lqg, solve_care, solve_dare)


def _spr_cont_system(rng, n, m):
    """Strictly positive-real continuous system by KYP construction:
    stable A, C = BᵀP₀ with P₀ ≻ 0, E = D + Dᵀ ≻ 0."""
    M = rng.standard_normal((n, n))
    A = -(M @ M.T) - 0.7 * np.eye(n) + 0.3 * rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    P0 = np.eye(n) * 2.0
    C = B.T @ P0
    D = np.eye(m) * 1.5 + 0.2 * rng.standard_normal((m, m))
    return map(jnp.asarray, (A, B, C, D))


def test_ctsf_satisfies_defining_equation(rng):
    A, B, C, D = _spr_cont_system(rng, 5, 2)
    P = solve_ctsf(A, B, C, D)
    E = D + D.T
    Abar = A - B @ jnp.linalg.solve(E, C)
    res = (B @ jnp.linalg.solve(E, B.T) + P @ Abar.T + Abar @ P
           + P @ C.T @ jnp.linalg.solve(E, C) @ P)
    assert float(jnp.max(jnp.abs(res))) < 1e-10
    # nonnegative definite (the documented solution branch)
    assert float(jnp.min(jnp.linalg.eigvalsh(P))) > -1e-10


def test_ctsf_factor_is_stable(rng):
    """The spectral factor's closed-loop matrix Ā + P CᵀE⁻¹C must be the
    antistable reflection ⇒ Ā − (...) stable: check the minimum-phase
    property via eigenvalues of the factor dynamics."""
    A, B, C, D = _spr_cont_system(rng, 5, 2)
    P = solve_ctsf(A, B, C, D)
    E = D + D.T
    Abar = A - B @ jnp.linalg.solve(E, C)
    Acl = Abar + P @ C.T @ jnp.linalg.solve(E, C)
    eig = np.linalg.eigvals(np.asarray(Acl))
    assert np.max(eig.real) < 1e-8


def test_dtsf_satisfies_defining_equation(rng):
    n, m = 5, 2
    F = 0.5 * rng.standard_normal((n, n))
    F = F / max(1.0, 1.3 * np.max(np.abs(np.linalg.eigvals(F))))
    G = 0.5 * rng.standard_normal((n, m))
    H = G.T @ (np.eye(n) * 0.6)
    J = np.eye(m) * 2.0
    F, G, H, J = map(jnp.asarray, (F, G, H, J))
    P = solve_dtsf(F, G, H, J)
    E = J + J.T
    inner = E - H @ P @ H.T
    res = (-P + F @ P @ F.T
           + (G - F @ P @ H.T) @ jnp.linalg.solve(inner, G.T - H @ P @ F.T))
    assert float(jnp.max(jnp.abs(res))) < 1e-10
    assert float(jnp.min(jnp.linalg.eigvalsh(P))) > -1e-10
    # the factorization's innovation covariance must stay positive
    assert float(jnp.min(jnp.linalg.eigvalsh(inner))) > 0.0


def test_ihct_lqg_gains(rng):
    n, m, p = 4, 2, 3
    A = jnp.asarray(rng.standard_normal((n, n)))
    B = jnp.asarray(rng.standard_normal((n, m)))
    C = jnp.asarray(rng.standard_normal((p, n)))
    Q = jnp.eye(n) * 2.0
    R = jnp.eye(m) * 0.5
    V = jnp.eye(n) * 0.3
    W = jnp.eye(p) * 0.2
    K, P, L, S = solve_ihct_lqg(A, B, C, V, W, Q, R)
    # regulator CARE residual
    res_c = A.T @ P + P @ A - P @ B @ jnp.linalg.solve(R, B.T) @ P + Q
    assert float(jnp.max(jnp.abs(res_c))) < 1e-8
    # filter CARE residual
    res_f = A @ S + S @ A.T - S @ C.T @ jnp.linalg.solve(W, C) @ S + V
    assert float(jnp.max(jnp.abs(res_f))) < 1e-8
    # separation: both closed loops stable
    assert np.max(np.linalg.eigvals(np.asarray(A - B @ K)).real) < 0
    assert np.max(np.linalg.eigvals(np.asarray(A - L @ C)).real) < 0
    np.testing.assert_allclose(np.asarray(L),
                               np.asarray(S @ C.T @ jnp.linalg.inv(W)),
                               rtol=1e-8, atol=1e-10)


def test_ihdt_lqg_gains(rng):
    n, m, p = 4, 2, 3
    F = jnp.asarray(0.9 * rng.standard_normal((n, n)) / np.sqrt(n))
    G = jnp.asarray(rng.standard_normal((n, m)))
    H = jnp.asarray(rng.standard_normal((p, n)))
    Q = jnp.eye(n)
    R = jnp.eye(m) * 0.4
    V = jnp.eye(n) * 0.3
    W = jnp.eye(p) * 0.2
    K, P, L, S = solve_ihdt_lqg(F, G, H, V, W, Q, R)
    # regulator DARE residual
    res_c = (F.T @ P @ F - P
             - F.T @ P @ G @ jnp.linalg.solve(R + G.T @ P @ G, G.T @ P @ F)
             + Q)
    assert float(jnp.max(jnp.abs(res_c))) < 1e-8
    # predicted-covariance filter DARE residual
    res_f = (F @ S @ F.T - S
             - F @ S @ H.T @ jnp.linalg.solve(W + H @ S @ H.T, H @ S @ F.T)
             + V)
    assert float(jnp.max(jnp.abs(res_f))) < 1e-8
    assert np.max(np.abs(np.linalg.eigvals(np.asarray(F - G @ K)))) < 1
    assert np.max(np.abs(np.linalg.eigvals(np.asarray(F - F @ L @ H)))) < 1


def test_spectral_consistency_with_care(rng):
    """With C = Bᵀ and D + Dᵀ = I the CTSF collapses to a plain filter CARE
    — cross-check the two entry points agree."""
    n = 4
    M = rng.standard_normal((n, n))
    A = jnp.asarray(-(M @ M.T) - 0.5 * np.eye(n))
    B = jnp.asarray(rng.standard_normal((n, 2)))
    C = B.T
    D = jnp.eye(2) * 0.5
    P1 = solve_ctsf(A, B, C, D)
    # equivalent filter CARE: Ā P + P Āᵀ + P CᵀC P + B Bᵀ = 0, Ā = A − BBᵀ
    Abar = A - B @ B.T
    X = solve_care(Abar.T, B, -(B @ B.T), jnp.eye(2))
    np.testing.assert_allclose(np.asarray(P1), np.asarray(-X), rtol=1e-8,
                               atol=1e-10)

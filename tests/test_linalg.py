"""Dense numerics tests (parity model: ref unit_test_mat_num.cpp, unit_test_mat_are.cpp)."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from reak_tpu.math import linalg as la
from reak_tpu.math import are


def rand_spd(rng, b, n):
    A = rng.standard_normal((b, n, n))
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) + n * np.eye(n))


def test_solve_pd(rng):
    A = rand_spd(rng, 4, 6)
    b = jnp.asarray(rng.standard_normal((4, 6)))
    x = la.solve_pd(A, b)
    np.testing.assert_allclose(A @ x[..., None], b[..., None], atol=1e-9)
    B = jnp.asarray(rng.standard_normal((4, 6, 3)))
    X = la.solve_pd(A, B)
    np.testing.assert_allclose(A @ X, B, atol=1e-9)


def test_invert_logdet_pd(rng):
    A = rand_spd(rng, 3, 5)
    Ainv = la.invert_pd(A)
    np.testing.assert_allclose(A @ Ainv, np.broadcast_to(np.eye(5), (3, 5, 5)), atol=1e-9)
    np.testing.assert_allclose(
        la.logdet_pd(A), np.linalg.slogdet(np.asarray(A))[1], atol=1e-9
    )


def test_lstsq(rng):
    A = jnp.asarray(rng.standard_normal((3, 8, 4)))
    b = jnp.asarray(rng.standard_normal((3, 8)))
    x = la.solve_lstsq(A, b)
    xr = np.stack([np.linalg.lstsq(np.asarray(A[i]), np.asarray(b[i]), rcond=None)[0] for i in range(3)])
    np.testing.assert_allclose(x, xr, atol=1e-9)


def test_minnorm(rng):
    A = jnp.asarray(rng.standard_normal((2, 3, 6)))
    b = jnp.asarray(rng.standard_normal((2, 3)))
    x = la.solve_minnorm(A, b)
    np.testing.assert_allclose(A @ x[..., None], b[..., None], atol=1e-9)


def test_expm(rng):
    A = jnp.asarray(rng.standard_normal((4, 5, 5)) * 0.5)
    E = la.expm_pade(A)
    Er = np.stack([scipy.linalg.expm(np.asarray(A[i])) for i in range(4)])
    np.testing.assert_allclose(E, Er, rtol=1e-8, atol=1e-9)


def test_sqrtm_psd(rng):
    A = rand_spd(rng, 3, 4)
    S = la.sqrtm_psd(A)
    np.testing.assert_allclose(S @ S, A, atol=1e-8)


def test_norms(rng):
    A = jnp.asarray(rng.standard_normal((2, 4, 5)))
    np.testing.assert_allclose(la.one_norm(A), np.max(np.abs(np.asarray(A)).sum(-2), -1))
    np.testing.assert_allclose(la.inf_norm(A), np.max(np.abs(np.asarray(A)).sum(-1), -1))


def test_dare_vs_scipy(rng):
    n, m = 4, 2
    A = np.asarray(0.9 * np.eye(n) + 0.1 * rng.standard_normal((n, n)))
    B = rng.standard_normal((n, m))
    Q = np.eye(n) * 2.0
    R = np.eye(m) * 0.5
    X = are.solve_dare(jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q), jnp.asarray(R))
    Xr = scipy.linalg.solve_discrete_are(A, B, Q, R)
    np.testing.assert_allclose(X, Xr, rtol=1e-7, atol=1e-8)


def test_care_vs_scipy(rng):
    n, m = 4, 2
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    Q = np.eye(n) * 2.0
    R = np.eye(m) * 0.5
    X = are.solve_care(jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q), jnp.asarray(R))
    Xr = scipy.linalg.solve_continuous_are(A, B, Q, R)
    np.testing.assert_allclose(X, Xr, rtol=1e-6, atol=1e-7)


def test_dare_batched(rng):
    n, m, batch = 3, 1, 5
    A = 0.8 * np.stack([np.eye(n) + 0.1 * rng.standard_normal((n, n)) for _ in range(batch)])
    B = rng.standard_normal((batch, n, m))
    Q = np.broadcast_to(np.eye(n), (batch, n, n)).copy()
    R = np.broadcast_to(np.eye(m), (batch, m, m)).copy()
    X = are.solve_dare(jnp.asarray(A), jnp.asarray(B), jnp.asarray(Q), jnp.asarray(R))
    for i in range(batch):
        Xr = scipy.linalg.solve_discrete_are(A[i], B[i], Q[i], R[i])
        np.testing.assert_allclose(X[i], Xr, rtol=1e-7, atol=1e-8)


def test_dlqr_stabilizes(rng):
    n, m = 4, 2
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    K, P = are.dlqr(jnp.asarray(A), jnp.asarray(B), jnp.asarray(np.eye(n)), jnp.asarray(np.eye(m)))
    eig = np.linalg.eigvals(np.asarray(A) - np.asarray(B) @ np.asarray(K))
    assert np.all(np.abs(eig) < 1.0)


def test_clqr_stabilizes(rng):
    n, m = 4, 2
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    K, P = are.clqr(jnp.asarray(A), jnp.asarray(B), jnp.asarray(np.eye(n)), jnp.asarray(np.eye(m)))
    eig = np.linalg.eigvals(np.asarray(A) - np.asarray(B) @ np.asarray(K))
    assert np.all(eig.real < 0.0)


def test_star_product_identity(rng):
    # star product with identity map returns the operand
    n = 3
    A = jnp.asarray(rng.standard_normal((n, n)) * 0.3)
    B = jnp.asarray(la.symmetrize(jnp.asarray(rng.standard_normal((n, n)) * 0.2)))
    C = jnp.asarray(la.symmetrize(jnp.asarray(rng.standard_normal((n, n)) * 0.2)))
    D = jnp.asarray(rng.standard_normal((n, n)) * 0.3)
    eye = jnp.eye(n)
    zero = jnp.zeros((n, n))
    ident = ((eye, zero), (zero, eye))
    M = ((A, B), (C, D))
    ((A2, B2), (C2, D2)) = la.star_product(ident, M)
    np.testing.assert_allclose(A2, A, atol=1e-12)
    np.testing.assert_allclose(B2, B, atol=1e-12)
    np.testing.assert_allclose(C2, C, atol=1e-12)
    np.testing.assert_allclose(D2, D, atol=1e-12)

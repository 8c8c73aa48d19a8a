"""Pallas batch-in-lanes Cholesky kernel (reak_tpu/ops/chol_lanes.py) —
correctness vs dense solve via the Pallas interpreter on CPU; the real-TPU
path is exercised by bench runs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.ops import chol_lanes
from reak_tpu.math.linalg import small_chol_solve


def _spd_batch(rng, B, n, dtype=np.float32):
    A = rng.standard_normal((B, n, n)).astype(dtype)
    G = A @ np.swapaxes(A, -1, -2) + 3 * np.eye(n, dtype=dtype)
    rhs = rng.standard_normal((B, n)).astype(dtype)
    return G, rhs


@pytest.mark.parametrize("n", [3, 6, 12])
def test_kernel_matches_dense_solve(rng, n):
    B = 2048
    G, rhs = _spd_batch(rng, B, n)
    Gl = jnp.moveaxis(jnp.asarray(G), 0, -1)
    rl = jnp.moveaxis(jnp.asarray(rhs), 0, -1)
    x = chol_lanes.solve_lanes(Gl, rl, interpret=True)
    got = np.moveaxis(np.asarray(x), -1, 0)
    ref = np.linalg.solve(G.astype(np.float64), rhs[..., None].astype(np.float64))[..., 0]
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_kernel_matches_unrolled_jnp(rng):
    B, n = 1024, 6
    G, rhs = _spd_batch(rng, B, n)
    Gl = jnp.moveaxis(jnp.asarray(G), 0, -1)
    rl = jnp.moveaxis(jnp.asarray(rhs), 0, -1)
    x1 = np.moveaxis(np.asarray(chol_lanes.solve_lanes(Gl, rl, interpret=True)), -1, 0)
    x2 = np.asarray(small_chol_solve(jnp.asarray(G), jnp.asarray(rhs)))
    np.testing.assert_allclose(x1, x2, atol=1e-5)


def test_solve_dispatch_fallback_on_cpu(rng):
    """On CPU (tests) solve() must take the jnp fallback and stay correct."""
    B, n = 100, 6  # non-multiple of 1024 → fallback regardless of backend
    G, rhs = _spd_batch(rng, B, n)
    x = np.asarray(chol_lanes.solve(jnp.asarray(G), jnp.asarray(rhs)))
    ref = np.linalg.solve(G.astype(np.float64), rhs[..., None].astype(np.float64))[..., 0]
    np.testing.assert_allclose(x, ref, atol=2e-5)


def test_batch_alignment_assertion(rng):
    G, rhs = _spd_batch(rng, 1000, 6)  # not a multiple of 1024
    Gl = jnp.moveaxis(jnp.asarray(G), 0, -1)
    rl = jnp.moveaxis(jnp.asarray(rhs), 0, -1)
    with pytest.raises(AssertionError):
        chol_lanes.solve_lanes(Gl, rl, interpret=True)

"""Order-3/4 tensor algebra helpers.

TPU-native equivalent of the reference's core/tensors layer
(ref: core/tensors/tensor_alg_rectangular.hpp, tensor_alg_square.hpp,
tensor_alg_nil.hpp, adaptors + concepts — declared but lightly used in the
reference; SURVEY.md §2.5 flags it low priority).  On TPU a "tensor type"
is just an array with contraction conventions, so this module provides the
named contractions the reference's adaptors would perform, all batched.
"""
from __future__ import annotations

import jax.numpy as jnp


def tensor3_vec(T, v):
    """Mode-3 contraction: (..., i, j, k) × (..., k) → (..., i, j)
    (the reference's tensor-from-matrix adaptor applied in reverse)."""
    return jnp.einsum("...ijk,...k->...ij", T, v)


def tensor3_mat(T, M):
    """Mode-3 matrix product: (..., i, j, k) × (..., k, l) → (..., i, j, l)."""
    return jnp.einsum("...ijk,...kl->...ijl", T, M)


def vec_tensor3(v, T):
    """Mode-1 contraction: (..., i) × (..., i, j, k) → (..., j, k)."""
    return jnp.einsum("...i,...ijk->...jk", v, T)


def tensor4_mat(T, M):
    """Double contraction: (..., i, j, k, l) × (..., k, l) → (..., i, j)
    (e.g. an elasticity tensor applied to a strain matrix)."""
    return jnp.einsum("...ijkl,...kl->...ij", T, M)


def outer3(a, b, c):
    """Rank-1 order-3 tensor a ⊗ b ⊗ c."""
    return jnp.einsum("...i,...j,...k->...ijk", a, b, c)


def identity3(n, dtype=jnp.float32):
    """δ_ij e_k-style 'nil + diagonal' helper (ref: tensor_alg_nil.hpp role:
    structural zero/identity tensors collapse into explicit arrays here)."""
    eye = jnp.eye(n, dtype=dtype)
    return jnp.einsum("ij,k->ijk", eye, jnp.ones(n, dtype))


def sym_part3(T):
    """Symmetrize an order-3 tensor over its last two indices."""
    return 0.5 * (T + jnp.swapaxes(T, -1, -2))

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


# ---------------------------------------------------------------------------
# generic mode-n machinery (the reference's adaptor layer — a tensor viewed
# as a matrix along any mode, tensor_alg_rectangular.hpp adaptors — becomes
# explicit unfold/fold + mode products here)
# ---------------------------------------------------------------------------


def unfold(T, mode: int):
    """Mode-n matricization: move ``mode`` first, flatten the rest →
    (I_mode, prod(other dims)).  The reference's matrix-adaptor view of a
    tensor (core/tensors adaptors) as an explicit layout transform."""
    return jnp.moveaxis(T, mode, 0).reshape(T.shape[mode], -1)


def fold(M, mode: int, shape):
    """Inverse of :func:`unfold` back to ``shape``."""
    full = (shape[mode],) + tuple(s for i, s in enumerate(shape) if i != mode)
    return jnp.moveaxis(M.reshape(full), 0, mode)


def mode_dot(T, M, mode: int):
    """Mode-n product T ×_n M: contract tensor mode ``mode`` with the last
    axis of matrix ``M`` — T'(..., a, ...) = Σ_b M[a, b] T(..., b, ...)."""
    out = jnp.tensordot(M, T, axes=([1], [mode]))
    return jnp.moveaxis(out, 0, mode)


def multi_mode_dot(T, mats):
    """Apply ``mats[i]`` along mode i for every non-None entry (Tucker-style
    multilinear transform; e.g. rotating every index of a stiffness tensor
    into a new frame)."""
    for i, M in enumerate(mats):
        if M is not None:
            T = mode_dot(T, M, i)
    return T


def ttt(A, B, modes_a, modes_b):
    """Tensor-times-tensor contraction over the given mode lists
    (the general contraction the reference's concept layer specifies,
    core/tensors/tensor_concepts.hpp)."""
    return jnp.tensordot(A, B, axes=(tuple(modes_a), tuple(modes_b)))


def tensor3_rotate(T, R):
    """Rotate all three indices of an order-3 tensor into the frame of R:
    T'_{abc} = R_{ai} R_{bj} R_{ck} T_{ijk} (frame change of e.g. a
    piezoelectric/third-moment tensor)."""
    return multi_mode_dot(T, [R, R, R])


def tensor4_rotate(T, R):
    """Rotate all four indices: T'_{abcd} = R_{ai}R_{bj}R_{ck}R_{dl} T_{ijkl}."""
    return multi_mode_dot(T, [R, R, R, R])

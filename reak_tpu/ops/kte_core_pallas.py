"""Fused KTE step-core Pallas kernel — twist-shaping + aggregate-mass
assembly + factorization + linearization in ONE kernel.

This is the fused hot-path kernel SURVEY §2.24 calls for (the math of
mass_matrix_calculator.cpp:100-287 `M = TᵀMcmT` + manipulator_model.cpp:346
Cholesky + the LTV derivatives): the register-form step core
(kte/soa.py) emits ~10⁴ scalar-on-lanes HLO ops per rollout step; XLA splits
them into hundreds of fusions with HBM round-trips between them.  Running
the SAME traced code inside one `pallas_call` keeps every intermediate in
VMEM/vector registers: per batch tile the kernel reads x (n,) u (m,) and
writes (q̈, ∂q̈/∂x, M⁻¹) with zero intermediate HBM traffic.

The kernel body literally calls the register-form building blocks
(make_terms_soa, _chol_solve_reg, jax.linearize) — Pallas kernels are traced
JAX programs, so the TPU kernel and the XLA fallback share one source of
truth for the math (numerics asserted equal in tests/test_ops_pallas.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from reak_tpu.kte.spec import ChainSpec

FORCE_INTERPRET = os.environ.get("REAK_PALLAS_INTERPRET", "") == "1"

# VMEM budget: the ~10⁴-value dataflow of the 6-DoF core peaks at ~12 MB of
# scoped VMEM at lane tile 512 (measured; 1024 exceeds the 16 MB limit)
_TILE = 512


def make_core(spec: ChainSpec):
    """The register-form step core (shared by the kernel and the fallback):
    ``core(x_tup (n × (B,)), u_cols (m × (B,))) → (qdd, dd_sol, minv_sol)``
    with qdd an nv-tuple of (B,), dd_sol an nv-tuple of (n, B) state
    derivatives, minv_sol an nv-tuple of (nv, 1)-broadcastable M⁻¹ rows."""
    from reak_tpu.kte import soa

    nv = spec.nv
    n = 2 * nv
    terms = soa.make_terms_soa(spec)

    def core(x_tup, u_cols):
        def terms_flat(xt):
            return terms(xt[:nv], xt[nv:])

        (M, f), lin_fn = jax.linearize(terms_flat, x_tup)
        f_tau = tuple(fi + ui for fi, ui in zip(f, u_cols))
        batch_shape = x_tup[0].shape
        dt_ = x_tup[0].dtype
        # kernel-safe unit tangents: iota comparisons, no captured consts
        tangents = tuple(
            (jax.lax.broadcasted_iota(jnp.int32, (n,) + batch_shape, 0) == i
             ).astype(dt_)
            for i in range(n)
        )
        Mt, ft = jax.vmap(lin_fn)(tangents)
        (qdd,) = soa._chol_solve_reg(M, [f_tau])
        dd_rhs = tuple(
            ft[i] - sum(Mt[i][j] * qdd[j] for j in range(nv))
            for i in range(nv)
        )
        eye_rhs = tuple(
            (jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0) == i).astype(dt_)
            for i in range(nv)
        )
        dd_sol, minv_sol = soa._chol_solve_reg(M, [dd_rhs, eye_rhs])
        return qdd, dd_sol, minv_sol

    return core


def make_core_lanes(spec: ChainSpec, tile: int = _TILE, interpret: bool = None):
    """Pallas-fused core with lanes-layout I/O:
    ``fn(x (n, B), u (m, B)) → (qdd (nv, B), dqdd (nv, n, B), minv (nv, nv, B))``
    B must be a multiple of ``tile``.  ``interpret=True`` runs the kernel in
    interpret mode (CPU tests)."""
    if interpret is None:
        interpret = FORCE_INTERPRET
    nv = spec.nv
    n = 2 * nv
    core = make_core(spec)

    def kernel(x_ref, u_ref, qdd_ref, dd_ref, minv_ref):
        x_tup = tuple(x_ref[i, :] for i in range(n))
        u_cols = tuple(u_ref[i, :] for i in range(nv))
        qdd, dd_sol, minv_sol = core(x_tup, u_cols)
        for i in range(nv):
            qdd_ref[i, :] = qdd[i]
            dd_ref[i] = dd_sol[i]  # (n, tile)
            minv_ref[i] = minv_sol[i] + jnp.zeros_like(minv_ref[i])

    def fn(x, u):
        B = x.shape[-1]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        grid = B // tile
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((n, tile), lambda i: (0, i)),
                pl.BlockSpec((nv, tile), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((nv, tile), lambda i: (0, i)),
                pl.BlockSpec((nv, n, tile), lambda i: (0, 0, i)),
                pl.BlockSpec((nv, nv, tile), lambda i: (0, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nv, B), x.dtype),
                jax.ShapeDtypeStruct((nv, n, B), x.dtype),
                jax.ShapeDtypeStruct((nv, nv, B), x.dtype),
            ],
            interpret=interpret,
        )(x, u)

    return fn


def make_core_lanes_xla(spec: ChainSpec):
    """Same I/O contract as make_core_lanes, pure-XLA (fallback / oracle)."""
    nv = spec.nv
    n = 2 * nv
    core = make_core(spec)

    def fn(x, u):
        x_tup = tuple(x[i] for i in range(n))
        u_cols = tuple(u[i] for i in range(nv))
        qdd, dd_sol, minv_sol = core(x_tup, u_cols)
        B = x.shape[-1]
        qdd_a = jnp.stack(qdd)
        dd_a = jnp.stack([dd_sol[i] for i in range(nv)])
        minv_a = jnp.stack([
            jnp.broadcast_to(minv_sol[i], (nv, B)) for i in range(nv)
        ])
        return qdd_a, dd_a, minv_a

    return fn

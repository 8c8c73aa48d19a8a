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
from jax.experimental.pallas import tpu as pltpu

from reak_tpu.kte.spec import ChainSpec

FORCE_INTERPRET = os.environ.get("REAK_PALLAS_INTERPRET", "") == "1"

# Tile 1024 = one full (8, 128) f32 VPU tile of scenarios per register value;
# the ~10⁴-value dataflow of the 6-DoF core peaks at ~24 MB of scoped VMEM
# (raise/lower with REAK_KTE_VMEM, MiB)
_TILE = 1024
_VMEM_LIMIT = int(os.environ.get("REAK_KTE_VMEM", 64)) * 1024 * 1024

# Batch tiles are shaped (tile//128, 128) inside the kernels: a flat (tile,)
# value occupies 1 sublane × tile/128 lane-groups (⅛ VPU row utilization per
# op); the 2-D shape fills all 8 sublanes at tile=1024.  The reshapes happen
# at the array boundary (contiguous, metadata-only) — kernel refs are blocked
# directly in (…, ts, 128) form so no in-kernel relayout is needed.


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
        ones = (1,) * len(batch_shape)
        eye_rhs = tuple(
            (jax.lax.broadcasted_iota(jnp.int32, (nv,) + ones, 0) == i
             ).astype(dt_)
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

    # Compiled TPU path: batch tiles shaped (ts, 128) so each register value
    # fills whole (8, 128) VPU tiles.  Tiny unaligned tiles (interpret-mode
    # tests) keep the flat (tile,) layout.
    two_d = tile % (8 * 128) == 0
    ts = tile // 128 if two_d else 1

    def kernel(x_ref, u_ref, qdd_ref, dd_ref, minv_ref):
        x_tup = tuple(x_ref[i] for i in range(n))    # (ts, 128) or (tile,)
        u_cols = tuple(u_ref[i] for i in range(nv))
        qdd, dd_sol, minv_sol = core(x_tup, u_cols)
        for i in range(nv):
            qdd_ref[i] = qdd[i]
            dd_ref[i] = dd_sol[i]
            minv_ref[i] = minv_sol[i] + jnp.zeros_like(minv_ref[i])

    def fn(x, u):
        B = x.shape[-1]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        grid = B // tile
        if two_d:
            nt = B // 128
            bshape = lambda *lead: (*lead, ts, 128)
            bmap3 = lambda i: (0, i, 0)
            bmap4 = lambda i: (0, 0, i, 0)
            oshape = lambda *lead: (*lead, nt, 128)
            xin = (x.reshape(n, nt, 128), u.reshape(nv, nt, 128))
        else:
            bshape = lambda *lead: (*lead, tile)
            bmap3 = lambda i: (0, i)
            bmap4 = lambda i: (0, 0, i)
            oshape = lambda *lead: (*lead, B)
            xin = (x, u)
        in_specs = [pl.BlockSpec(bshape(n), bmap3),
                    pl.BlockSpec(bshape(nv), bmap3)]
        out_specs = [pl.BlockSpec(bshape(nv), bmap3),
                     pl.BlockSpec(bshape(nv, n), bmap4),
                     pl.BlockSpec(bshape(nv, nv), bmap4)]
        out_shape = [jax.ShapeDtypeStruct(oshape(nv), x.dtype),
                     jax.ShapeDtypeStruct(oshape(nv, n), x.dtype),
                     jax.ShapeDtypeStruct(oshape(nv, nv), x.dtype)]
        qdd, dd, minv = pl.pallas_call(
            kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(*xin)
        return (qdd.reshape(nv, B), dd.reshape(nv, n, B),
                minv.reshape(nv, nv, B))

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


# ---------------------------------------------------------------------------
# full-step kernel: core + exponential-series discretization in one kernel
# ---------------------------------------------------------------------------


def _rmul(A, B):
    """Register-form matmul over nested lists; skips literal-0 terms and
    folds literal-1 factors (the A_c top block is [0 | I])."""
    is0 = lambda v: isinstance(v, float) and v == 0.0
    is1 = lambda v: isinstance(v, float) and v == 1.0
    out = []
    for i in range(len(A)):
        row = []
        for j in range(len(B[0])):
            acc = 0.0
            for k in range(len(B)):
                a, b = A[i][k], B[k][j]
                if is0(a) or is0(b):
                    continue
                term = b if is1(a) else (a if is1(b) else a * b)
                acc = term if is0(acc) else acc + term
            row.append(acc)
        out.append(row)
    return out


def _rmv(A, x):
    is0 = lambda v: isinstance(v, float) and v == 0.0
    is1 = lambda v: isinstance(v, float) and v == 1.0
    out = []
    for i in range(len(A)):
        acc = 0.0
        for k in range(len(x)):
            a, b = A[i][k], x[k]
            if is0(a) or is0(b):
                continue
            term = b if is1(a) else (a if is1(b) else a * b)
            acc = term if is0(acc) else acc + term
        out.append(acc)
    return out


def make_step_lanes(spec: ChainSpec, dt: float, order: int = 4,
                    tile: int = _TILE, interpret: bool = None):
    """The ENTIRE rollout step in one Pallas kernel:
    ``fn(x (n, B), u (m, B)) → (Ad (n,n,B), Bd (n,m,B), cd (n,B),
    x_new (n,B))`` — core (terms + linearize + solves) PLUS the order-4
    exponential-series discretization, all VMEM-resident.  The series runs
    in register form with literal folding (the [0|I] block of A_c and the
    zero top of B_c cost nothing)."""
    if interpret is None:
        interpret = FORCE_INTERPRET
    nv = spec.nv
    n = 2 * nv
    core = make_core(spec)

    two_d = tile % (8 * 128) == 0
    ts = tile // 128 if two_d else 1

    def kernel(x_ref, u_ref, Ad_ref, Bd_ref, cd_ref, xn_ref):
        x_tup = tuple(x_ref[i] for i in range(n))    # (ts, 128) or (tile,)
        u_cols = tuple(u_ref[i] for i in range(nv))
        qdd, dd_sol, minv_sol = core(x_tup, u_cols)
        # A_c = [[0, I], [dqdd]], B_c = [[0], [M^-1]] as nested lists
        A_c = [[1.0 if j == nv + i else 0.0 for j in range(n)]
               for i in range(nv)]
        A_c += [[dd_sol[i][d2] for d2 in range(n)] for i in range(nv)]
        B_c = [[0.0] * nv for _ in range(nv)]
        # minv_sol[i] is (nv, B): row j holds (M⁻¹)[i, j] across the lanes
        B_c += [[minv_sol[i][j] for j in range(nv)] for i in range(nv)]
        f0 = list(x_tup[nv:]) + list(qdd)
        eye = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
        S = [[dt * e for e in row] for row in eye]
        term = [row[:] for row in S]
        for k in range(2, order + 1):
            term = _rmul(A_c, term)
            term = [[(dt / k) * e if not (isinstance(e, float) and e == 0.0)
                     else 0.0 for e in row] for row in term]
            S = [[a + b if not (isinstance(b, float) and b == 0.0) else a
                  for a, b in zip(r1, r2)] for r1, r2 in zip(S, term)]
        AS = _rmul(A_c, S)
        # Ad = I + A_c·S, skipping literal-zero additions
        Ad = [[e if isinstance(a, float) and a == 0.0 else
               (a if isinstance(e, float) and e == 0.0 else a + e)
               for a, e in zip(ra, re)] for ra, re in zip(AS, eye)]
        Bd = _rmul(S, B_c)
        Sf0 = _rmv(S, f0)
        x_new = [x_tup[i] + Sf0[i] for i in range(n)]
        Adx = _rmv(Ad, list(x_tup))
        Bdu = _rmv(Bd, list(u_cols))
        cd = [x_new[i] - Adx[i] - Bdu[i] for i in range(n)]
        zero = jnp.zeros_like(x_tup[0])
        asarr = lambda v: zero + v  # literal floats → lanes arrays
        for i in range(n):
            for j in range(n):
                Ad_ref[i, j] = asarr(Ad[i][j])
            for j in range(nv):
                Bd_ref[i, j] = asarr(Bd[i][j])
            cd_ref[i] = asarr(cd[i])
            xn_ref[i] = asarr(x_new[i])

    def fn(x, u):
        B = x.shape[-1]
        assert B % tile == 0
        grid = B // tile
        if two_d:
            nt = B // 128
            bshape = lambda *lead: (*lead, ts, 128)
            bmap2 = lambda i: (0, i, 0)
            bmap3 = lambda i: (0, 0, i, 0)
            oshape = lambda *lead: (*lead, nt, 128)
            xin = (x.reshape(n, nt, 128), u.reshape(nv, nt, 128))
        else:
            bshape = lambda *lead: (*lead, tile)
            bmap2 = lambda i: (0, i)
            bmap3 = lambda i: (0, 0, i)
            oshape = lambda *lead: (*lead, B)
            xin = (x, u)
        Ad, Bd, cd, xn = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(bshape(n), bmap2),
                      pl.BlockSpec(bshape(nv), bmap2)],
            out_specs=[pl.BlockSpec(bshape(n, n), bmap3),
                       pl.BlockSpec(bshape(n, nv), bmap3),
                       pl.BlockSpec(bshape(n), bmap2),
                       pl.BlockSpec(bshape(n), bmap2)],
            out_shape=[jax.ShapeDtypeStruct(oshape(n, n), x.dtype),
                       jax.ShapeDtypeStruct(oshape(n, nv), x.dtype),
                       jax.ShapeDtypeStruct(oshape(n), x.dtype),
                       jax.ShapeDtypeStruct(oshape(n), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(*xin)
        return (Ad.reshape(n, n, B), Bd.reshape(n, nv, B),
                cd.reshape(n, B), xn.reshape(n, B))

    return fn

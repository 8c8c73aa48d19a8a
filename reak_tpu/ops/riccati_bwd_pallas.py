"""Whole-backward-pass Pallas kernel for the scan-fused Riccati PDIP.

The fused PDIP's reverse pass (ctrl/riccati_soa.solve_box_mpc_riccati_soa_fused:
cost-gradient adjoint + Riccati matrix recursion + affine vector recursion)
is a 50-step `lax.scan` whose per-step body moves ~(n,n,B) carries through
HBM between dozens of small XLA fusions — measured ~80 µs/step, ~40 ms per
pass at B=8192.  This kernel runs the ENTIRE pass in one `pallas_call` with a
(batch-tiles, H) grid: the horizon dimension is sequential ("arbitrary"
semantics), the carries (V, λ, v) live in VMEM scratch across grid steps, and
each step streams exactly one (A_t, B_t, q_t, u_t, D_t) block in and one
(grad_t, K_t, G_t, k_t) block out — the bandwidth-optimal traffic.

Math is byte-identical to the scan body (same register/lanes ops, same
`_chol_solve_lanes` fallback recurrence); equivalence is asserted in
tests/test_ops_pallas.py (interpret mode) and on hardware by bench runs.
(ref lineage: mat_are_solver.hpp finite-horizon recursion +
mehrotra_method.hpp:269 barrier handling, as in ctrl/riccati_soa.py.)
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FORCE_INTERPRET = os.environ.get("REAK_PALLAS_INTERPRET", "") == "1"

_TILE = 512


def _mm(X, Y):
    return jnp.sum(X[:, :, None, :] * Y[None, :, :, :], axis=1)


def _mTm(X, Y):
    return jnp.sum(X[:, :, None, :] * Y[:, None, :, :], axis=0)


def _mTv(X, v):
    return jnp.sum(X * v[:, None, :], axis=0)


def _chol_solve(G, rhs):
    """Unrolled SPD solve, lanes layout (same recurrence as
    riccati_soa._chol_solve_lanes fallback)."""
    n = G.shape[0]
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = G[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jax.lax.rsqrt(s)
        inv_d[j] = d
        L[j][j] = s * d
        for i in range(j + 1, n):
            t = G[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * d
    ys = [None] * n
    for i in range(n):
        t = rhs[i]
        for k in range(i):
            t = t - L[i][k][None] * ys[k]
        ys[i] = t * inv_d[i][None]
    xs = [None] * n
    for i in reversed(range(n)):
        t = ys[i]
        for k in range(i + 1, n):
            t = t - L[k][i][None] * xs[k]
        xs[i] = t * inv_d[i][None]
    return jnp.stack(xs, axis=0)


def make_fused_backward(H: int, n: int, m: int, tile: int = _TILE,
                        interpret: bool = None):
    """Returns ``fn(A (H,n,n,B), Bm (H,n,m,B), qs (H,n,B), u_eff (H,m,B),
    D (H,m,B), Q (n,n), QN (n,n), R (m,m)) →
    (grad (H,m,B), K (H,m,n,B), G (H,m,m,B), k_aff (H,m,B))``
    — the fused adjoint + Riccati backward + affine vector backward."""
    if interpret is None:
        interpret = FORCE_INTERPRET

    def kernel(A_ref, B_ref, q_ref, u_ref, D_ref, Q_ref, QN_ref, R_ref,
               grad_ref, K_ref, G_ref, k_ref, V_sc, lam_sc, v_sc):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _init():
            V_sc[...] = jnp.broadcast_to(QN_ref[...][:, :, None],
                                         V_sc.shape).astype(V_sc.dtype)
            lam_sc[...] = jnp.zeros_like(lam_sc)
            v_sc[...] = jnp.zeros_like(v_sc)

        At = A_ref[0]          # (n, n, T)
        Bt = B_ref[0]          # (n, m, T)
        qt = q_ref[0]          # (n, T)
        ut = u_ref[0]          # (m, T)
        Dt = D_ref[0]          # (m, T)
        V = V_sc[...]
        lam = lam_sc[...]
        v = v_sc[...]

        lam_full = qt + lam
        Rc = R_ref[...]
        grad_t = jnp.sum(Rc[:, :, None] * ut[None], axis=1) + _mTv(Bt, lam_full)
        VB = _mm(V, Bt)                                      # (n, m, T)
        eye_m = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0) == \
            jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        G = (Rc[:, :, None] + eye_m.astype(V.dtype)[:, :, None]
             * Dt[:, None, :]) + _mTm(Bt, VB)                # (m, m, T)
        F = _mTm(VB, At)                                     # (m, n, T)
        K = _chol_solve(G, F)                                # (m, n, T)
        w = grad_t + _mTv(Bt, v)                             # (m, T)
        k = _chol_solve(G, w[:, None, :])[:, 0]
        Qb = Q_ref[...][:, :, None]
        Vn = Qb + _mTm(At, _mm(V, At)) - _mTm(F, K)
        Vn = 0.5 * (Vn + jnp.swapaxes(Vn, 0, 1))
        vn = _mTv(At, v) - _mTv(K, w)
        lam_n = _mTv(At, lam_full)

        V_sc[...] = Vn
        lam_sc[...] = lam_n
        v_sc[...] = vn
        grad_ref[0] = grad_t
        K_ref[0] = K
        G_ref[0] = G
        k_ref[0] = k

    def fn(A, Bm, qs, u_eff, D, Q, QN, R):
        B = A.shape[-1]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        tiles = B // tile
        dtype = A.dtype
        # grid: (batch tile [parallel], reverse horizon [sequential])
        rev = lambda h: H - 1 - h
        grid = (tiles, H)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n, n, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, n, m, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, n, tile), lambda i, h: (rev(h), 0, i)),
                pl.BlockSpec((1, m, tile), lambda i, h: (rev(h), 0, i)),
                pl.BlockSpec((1, m, tile), lambda i, h: (rev(h), 0, i)),
                pl.BlockSpec((n, n), lambda i, h: (0, 0)),
                pl.BlockSpec((n, n), lambda i, h: (0, 0)),
                pl.BlockSpec((m, m), lambda i, h: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, m, tile), lambda i, h: (rev(h), 0, i)),
                pl.BlockSpec((1, m, n, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, m, m, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, m, tile), lambda i, h: (rev(h), 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, m, B), dtype),
                jax.ShapeDtypeStruct((H, m, n, B), dtype),
                jax.ShapeDtypeStruct((H, m, m, B), dtype),
                jax.ShapeDtypeStruct((H, m, B), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((n, n, tile), dtype),
                pltpu.VMEM((n, tile), dtype),
                pltpu.VMEM((n, tile), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(A, Bm, qs, u_eff, D, Q.astype(dtype), QN.astype(dtype),
          R.astype(dtype))
        return out

    return fn


def make_vector_backward(H: int, n: int, m: int, tile: int = _TILE,
                         interpret: bool = None):
    """Corrector vector backward pass as one kernel:
    ``fn(A (H,n,n,B), Bm (H,n,m,B), rhs (H,m,B), K (H,m,n,B), G (H,m,m,B))
    → k (H,m,B)`` with carry v in VMEM (re-factorizes the cached m×m G —
    ~m³/3 VPU ops, cheaper than streaming a stored factor)."""
    if interpret is None:
        interpret = FORCE_INTERPRET

    def kernel(A_ref, B_ref, r_ref, K_ref, G_ref, k_ref, v_sc):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _init():
            v_sc[...] = jnp.zeros_like(v_sc)

        At = A_ref[0]
        Bt = B_ref[0]
        rt = r_ref[0]
        K = K_ref[0]
        G = G_ref[0]
        v = v_sc[...]
        w = rt + _mTv(Bt, v)
        k = _chol_solve(G, w[:, None, :])[:, 0]
        v_sc[...] = _mTv(At, v) - _mTv(K, w)
        k_ref[0] = k

    def fn(A, Bm, rhs, K, G):
        B = A.shape[-1]
        assert B % tile == 0
        tiles = B // tile
        dtype = A.dtype
        rev = lambda h: H - 1 - h
        return pl.pallas_call(
            kernel,
            grid=(tiles, H),
            in_specs=[
                pl.BlockSpec((1, n, n, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, n, m, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, m, tile), lambda i, h: (rev(h), 0, i)),
                pl.BlockSpec((1, m, n, tile), lambda i, h: (rev(h), 0, 0, i)),
                pl.BlockSpec((1, m, m, tile), lambda i, h: (rev(h), 0, 0, i)),
            ],
            out_specs=[pl.BlockSpec((1, m, tile), lambda i, h: (rev(h), 0, i))],
            out_shape=[jax.ShapeDtypeStruct((H, m, B), dtype)],
            scratch_shapes=[pltpu.VMEM((n, tile), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(A, Bm, rhs, K, G)[0]

    return fn


def make_forward(H: int, n: int, m: int, tile: int = _TILE,
                 interpret: bool = None):
    """Closed-loop forward pass as one kernel:
    ``fn(A, Bm, K (H,m,n,B), k (H,m,B), dx0 (n,B)) → (du (H,m,B),
    dx (H,n,B))`` with the state deviation carried in VMEM."""
    if interpret is None:
        interpret = FORCE_INTERPRET

    def _mv_l(X, v):
        return jnp.sum(X * v[None, :, :], axis=1)

    def kernel(A_ref, B_ref, K_ref, k_ref, dx0_ref, du_ref, dx_ref, dx_sc):
        h = pl.program_id(1)

        @pl.when(h == 0)
        def _init():
            dx_sc[...] = dx0_ref[...]

        At = A_ref[0]
        Bt = B_ref[0]
        K = K_ref[0]
        k = k_ref[0]
        dx = dx_sc[...]
        du = -_mv_l(K, dx) - k
        dx1 = _mv_l(At, dx) + _mv_l(Bt, du)
        dx_sc[...] = dx1
        du_ref[0] = du
        dx_ref[0] = dx1

    def fn(A, Bm, K, k, dx0):
        B = A.shape[-1]
        assert B % tile == 0
        tiles = B // tile
        dtype = A.dtype
        return pl.pallas_call(
            kernel,
            grid=(tiles, H),
            in_specs=[
                pl.BlockSpec((1, n, n, tile), lambda i, h: (h, 0, 0, i)),
                pl.BlockSpec((1, n, m, tile), lambda i, h: (h, 0, 0, i)),
                pl.BlockSpec((1, m, n, tile), lambda i, h: (h, 0, 0, i)),
                pl.BlockSpec((1, m, tile), lambda i, h: (h, 0, i)),
                pl.BlockSpec((n, tile), lambda i, h: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, m, tile), lambda i, h: (h, 0, i)),
                pl.BlockSpec((1, n, tile), lambda i, h: (h, 0, i)),
            ],
            out_shape=[jax.ShapeDtypeStruct((H, m, B), dtype),
                       jax.ShapeDtypeStruct((H, n, B), dtype)],
            scratch_shapes=[pltpu.VMEM((n, tile), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(A, Bm, K, k, dx0)

    return fn

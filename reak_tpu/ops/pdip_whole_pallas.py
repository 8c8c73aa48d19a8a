"""Whole-solve Pallas kernel: the ENTIRE Mehrotra box-PDIP in one launch.

The round-3 PDIP already ran each of its per-iteration passes as a Pallas
kernel (ops/riccati_bwd_pallas.py), but the LTV data still round-tripped
through HBM between passes: per interior-point iteration the (H, n, n, B)
A-sequence is read by FOUR kernels (fused backward, affine forward,
corrector backward, corrector forward) and the (H, m, n, B) gains K and
(H, m, m, B) Schur blocks G are written once and re-read three/one times.
At H=50, n=12, m=6, B=8192 that is ~2 GB of HBM traffic per iteration,
~16 GB per 8-iteration solve — a ~20 ms bandwidth floor that matched the
measured 72.5 ms PDIP phase being HBM/launch bound (BENCH_r03: 18.8 % of
roofline, 2.3 % of VPU peak; VERDICT r3 weak #1).

This kernel removes that floor structurally: ONE `pallas_call` with a
1-D grid over batch tiles runs ALL interior-point iterations for its tile
with the whole-horizon working set resident in VMEM:

  * A (H,n,n,T) and B (H,n,m,T) are staged HBM→VMEM ONCE per solve by the
    pipeline (the next tile's fetch overlaps this tile's compute) and every
    backward/forward pass reads them from VMEM;
  * the gains K, Schur blocks G, the primal/dual state (u, sl, su, zl,
    zu), and the tracked trajectory xs never touch HBM at all — they live
    in VMEM scratch across iterations;
  * per-solve HBM traffic drops from ~16 GB/8192 solves to the inputs
    (A+B+c+x0 ≈ 46 KB/solve) plus outputs (u+xs ≈ 3.6 KB/solve) — under
    0.4 GB per batch, ~0.5 ms at v5e bandwidth — so the kernel runs at
    the VPU compute bound instead of the memory system.

Math is identical to ctrl/riccati_soa.solve_box_mpc_riccati_soa_fused
(same Mehrotra predictor-corrector with incremental trajectory tracking;
asserted against it in tests/test_ops_pallas.py via interpret mode and on
hardware by the bench parity artifact).  Reference lineage: finite-horizon
DARE recursion of mat_are_solver.hpp + barrier handling of
core/optimization/mehrotra_method.hpp:269, as in ctrl/riccati_soa.py.

Layout contract (lanes): A (H,n,n,B), B (H,n,m,B), c (H,n,B), x0 (n,B),
Q/QN (n,n), R (m,m), lb/ub (m,) → u (H,m,B), xs (H,n,B).  B must be a
multiple of the tile (128 lanes).

Reference tracking (``with_xref``/``with_uref``): tracking MPC — the common
real-world mode, and what the error-state manifold SQP (ctrl/mpc_manifold)
needs each pass — adds x_ref (H,n,B)/u_ref (H,m,B) inputs staged once per
tile like c; the stage cost becomes (x−x_ref)ᵀQ(x−x_ref) + (u−u_ref)ᵀR(u−u_ref)
(finite-horizon tracking recursion of ref mat_are_solver.hpp:1449 +
lqr_controllers.hpp:58).  Only the stage-gradient lines change; the whole
Mehrotra state stays VMEM-resident exactly as in the regulator path.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FORCE_INTERPRET = os.environ.get("REAK_PALLAS_INTERPRET", "") == "1"

_VMEM_LIMIT = int(os.environ.get('REAK_PDIP_VMEM', 100)) * 1024 * 1024
_TILE = 128  # lane tile; whole-horizon residency needs T small enough that
#              A (H·n²·T·4 B) + B + K + G + state fit in ~12 MB of VMEM


# ---- lanes-layout small-matrix algebra (batch on the last axis) -----------


def _ksl(X, k, axis):
    """Static keep-dim slice [k:k+1] along axis — lowers to lax.slice.
    (Integer indexing mixed with None-insertion lowers to gather, which the
    Mosaic TPU backend rejects inside kernels.)"""
    return jax.lax.slice_in_dim(X, k, k + 1, axis=axis)


def _mm(X, Y):
    """(i, k, T) @ (k, j, T) → (i, j, T), unrolled FMA accumulation.

    All contractions here unroll the tiny reduced dim as running FMAs: a
    broadcast-multiply + jnp.sum would materialize a 4-D (i, k, j, T)
    intermediate (n·n·n·T·4 ≈ 0.9 MB at n=12, T=128) in VMEM per product;
    the unrolled form keeps every intermediate at (i, j, T)."""
    acc = None
    for k in range(X.shape[1]):
        t = _ksl(X, k, 1) * _ksl(Y, k, 0)      # (i,1,T)·(1,j,T) → (i,j,T)
        acc = t if acc is None else acc + t
    return acc


def _mTm(X, Y):
    """Xᵀ Y: (k, i, T), (k, j, T) → (i, j, T)."""
    i = X.shape[1]
    T = X.shape[2]
    acc = None
    for k in range(X.shape[0]):
        Xk = _ksl(X, k, 0).reshape(i, 1, T)     # (1,i,T) → (i,1,T), size-1 moves
        t = Xk * _ksl(Y, k, 0)                  # (i,1,T)·(1,j,T) → (i,j,T)
        acc = t if acc is None else acc + t
    return acc


def _mv(X, v):
    """(i, k, T) @ (k, T) → (i, T)."""
    acc = None
    for k in range(X.shape[1]):
        t = _ksl(X, k, 1) * _ksl(v, k, 0)[None]  # (i,1,T)·(1,1,T) → (i,1,T)
        acc = t if acc is None else acc + t
    return jnp.squeeze(acc, axis=1)


def _mTv(X, v):
    """Xᵀ v: (k, i, T), (k, T) → (i, T)."""
    acc = None
    for k in range(X.shape[0]):
        t = _ksl(X, k, 0) * _ksl(v, k, 0)[None]  # (1,i,T)·(1,1,T) → (1,i,T)
        acc = t if acc is None else acc + t
    return jnp.squeeze(acc, axis=0)


def _sv(M, v):
    """Small constant matrix (i, k) times lanes vector (k, T) → (i, T)."""
    acc = None
    for k in range(M.shape[1]):
        t = _ksl(M, k, 1) * _ksl(v, k, 0)        # (i,1)·(1,T) → (i,T)
        acc = t if acc is None else acc + t
    return acc


def _chol_factor(G):
    """Unrolled Cholesky, lanes layout: G (p, p, T) SPD → (L strict-lower
    entries, inv-diag) — same recurrence as riccati_soa._chol_solve_lanes /
    the chol_lanes kernel, split so one factorization serves every solve
    against the same G (the PDIP solves each Schur block 3×: gain columns,
    affine rhs, corrector rhs)."""
    p = G.shape[0]
    L = [[None] * p for _ in range(p)]
    inv_d = [None] * p
    for j in range(p):
        s = G[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jax.lax.rsqrt(s)
        inv_d[j] = d
        L[j][j] = s * d
        for i in range(j + 1, p):
            t = G[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * d
    return L, inv_d


def _chol_apply(L, inv_d, rhs):
    """Forward/backward substitution with a cached factor: rhs (p, k, T)."""
    p = len(inv_d)
    ys = [None] * p
    for i in range(p):
        t = rhs[i]
        for k in range(i):
            t = t - L[i][k][None] * ys[k]
        ys[i] = t * inv_d[i][None]
    xs = [None] * p
    for i in reversed(range(p)):
        t = ys[i]
        for k in range(i + 1, p):
            t = t - L[k][i][None] * xs[k]
        xs[i] = t * inv_d[i][None]
    return jnp.stack(xs, axis=0)


def _pack_factor(L, inv_d):
    """(L, inv_d) → (p, p, T): strict lower = L, diagonal = 1/diag.
    (L's own diagonal is never used by substitution.)"""
    p = len(inv_d)
    rows = []
    zero = jnp.zeros_like(inv_d[0])
    for i in range(p):
        rows.append(jnp.stack(
            [L[i][j] if j < i else (inv_d[i] if j == i else zero)
             for j in range(p)], axis=0))
    return jnp.stack(rows, axis=0)


def _unpack_factor(P):
    p = P.shape[0]
    L = [[P[i, j] if j < i else None for j in range(p)] for i in range(p)]
    inv_d = [P[i, i] for i in range(p)]
    return L, inv_d


def _ld(ref, h):
    """Dynamic read of time-slice h from a (H, ...) VMEM ref."""
    return jnp.squeeze(ref[pl.ds(h, 1)], axis=0)


def _st(ref, h, val):
    """Dynamic write of time-slice h to a (H, ...) VMEM ref."""
    ref[pl.ds(h, 1)] = val[None]


def vmem_bytes_estimate(H: int, n: int, m: int, tile: int = _TILE,
                        with_xref: bool = False,
                        with_uref: bool = False) -> int:
    """Approximate VMEM working set of the whole-solve kernel: the
    double-buffered pipelined inputs/outputs plus the scratch buffers
    (kernel-stack temporaries excluded — callers should leave headroom)."""
    f = 4
    per_lane = (
        2 * (H * n * n + H * n * m + H * n + n)      # A, B, c, x0 (×2 bufs)
        + 2 * (H * m + H * n)                        # u, xs outputs (×2)
        + H * m * n + H * m * m                      # K, packed factors
        + 5 * H * m + 2 * H * n + 2 * H * m          # state + work buffers
        + (2 * H * n if with_xref else 0)            # x_ref (×2 bufs)
        + (2 * H * m if with_uref else 0)            # u_ref (×2 bufs)
    )
    return per_lane * tile * f


def fits_vmem(H: int, n: int, m: int, tile: int = _TILE,
              with_xref: bool = False, with_uref: bool = False) -> bool:
    """True when the whole-solve kernel's working set (plus ~25% stack
    headroom) fits the configured VMEM limit; callers fall back to the
    per-pass kernels otherwise."""
    est = vmem_bytes_estimate(H, n, m, tile, with_xref, with_uref)
    return est * 1.25 <= _VMEM_LIMIT


def make_whole_pdip(H: int, n: int, m: int, iters: int, tile: int = _TILE,
                    interpret: bool = None, with_xref: bool = False,
                    with_uref: bool = False):
    """Returns ``fn(A (H,n,n,B), Bm (H,n,m,B), c (H,n,B), [x_ref (H,n,B),]
    [u_ref (H,m,B),] x0 (n,B), Q (n,n), QN (n,n), R (m,m), lb (m,),
    ub (m,)) → (u (H,m,B), xs (H,n,B))`` — the complete box-constrained
    LTV-MPC solve, optionally tracking state/input references."""
    if interpret is None:
        interpret = FORCE_INTERPRET

    def kernel(*refs):
        it = iter(refs)
        A_s, B_s, c_ref = next(it), next(it), next(it)
        xr_ref = next(it) if with_xref else None
        ur_ref = next(it) if with_uref else None
        (x0_ref, Q_ref, QN_ref, R_ref, lb_ref, ub_ref, u_out, xs_out,
         K_s, G_s, u_s, sl_s, su_s, zl_s, zu_s, xs_s, w1_s, w2_s,
         dxs_s) = it
        # A_s/B_s are the full-horizon LTV blocks for this batch tile,
        # staged into VMEM by the Pallas pipeline (one fetch per tile; the
        # next tile's fetch overlaps this tile's compute).
        dtype = u_s.dtype
        lb = lb_ref[...][:, 0]                     # (m,)
        ub = ub_ref[...][:, 0]
        Rc = R_ref[...]
        Q = Q_ref[...]
        QN = QN_ref[...]
        eye_m = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
                 ).astype(dtype)
        mid = 0.5 * (lb + ub)
        half = 0.5 * (ub - lb)
        u_s[...] = jnp.broadcast_to(mid[None, :, None], (H, m, tile))
        sl_s[...] = jnp.broadcast_to(half[None, :, None], (H, m, tile))
        su_s[...] = jnp.broadcast_to(half[None, :, None], (H, m, tile))
        zl_s[...] = jnp.ones((H, m, tile), dtype)
        zu_s[...] = jnp.ones((H, m, tile), dtype)

        x0v = x0_ref[...]                          # (n, T)
        N2 = jnp.asarray(2.0 * H * m, dtype)

        # ---- initial nominal rollout (u = box midpoint) -------------------
        def roll0(h, x):
            x1 = (_mv(_ld(A_s, h), x)
                  + _mv(_ld(B_s, h), _ld(u_s, h)) + _ld(c_ref, h))
            _st(xs_s, h, x1)
            return x1

        jax.lax.fori_loop(0, H, roll0, x0v)

        def max_step(v, dv):
            t = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(t, axis=(0, 1)))

        # ---- interior-point iterations, all state resident in VMEM --------
        def iter_body(_, carry):
            # phase 1: fused reverse pass (adjoint + Riccati + affine rhs)
            def bwd(hh, c3):
                lam, V, v = c3
                h = H - 1 - hh
                At = _ld(A_s, h)
                Bt = _ld(B_s, h)
                lastf = jnp.where(hh == 0, 1.0, 0.0).astype(dtype)
                Qm = Q + (QN - Q) * lastf
                xs_h = _ld(xs_s, h)
                if xr_ref is not None:
                    xs_h = xs_h - _ld(xr_ref, h)
                qt = _sv(Qm, xs_h)
                ut = _ld(u_s, h)
                if ur_ref is not None:
                    ut = ut - _ld(ur_ref, h)
                Dt = (_ld(zl_s, h) / _ld(sl_s, h)
                      + _ld(zu_s, h) / _ld(su_s, h))
                lam_full = qt + lam
                grad_t = _sv(Rc, ut) + _mTv(Bt, lam_full)
                VB = _mm(V, Bt)
                G = (Rc[:, :, None] + eye_m[:, :, None] * Dt[:, None, :]
                     + _mTm(Bt, VB))
                F = _mTm(VB, At)
                Lf, inv_d = _chol_factor(G)
                K = _chol_apply(Lf, inv_d, F)
                w = grad_t + _mTv(Bt, v)
                k = _chol_apply(Lf, inv_d, w[:, None, :])[:, 0]
                Vn = Q[:, :, None] + _mTm(At, _mm(V, At)) - _mTm(F, K)
                Vn = 0.5 * (Vn + jnp.swapaxes(Vn, 0, 1))
                vn = _mTv(At, v) - _mTv(K, w)
                lam_n = _mTv(At, lam_full)
                _st(K_s, h, K)
                _st(G_s, h, _pack_factor(Lf, inv_d))
                _st(w2_s, h, grad_t)
                _st(w1_s, h, k)
                return (lam_n, Vn, vn)

            z_n = jnp.zeros((n, tile), dtype)
            V0 = jnp.broadcast_to(QN[:, :, None], (n, n, tile))
            jax.lax.fori_loop(0, H, bwd, (z_n, V0, z_n))

            # phase 2: affine forward (du_aff overwrites k_aff in w1)
            def fwd(h, dx):
                At = _ld(A_s, h)
                Bt = _ld(B_s, h)
                du = -_mv(_ld(K_s, h), dx) - _ld(w1_s, h)
                _st(w1_s, h, du)
                return _mv(At, dx) + _mv(Bt, du)

            jax.lax.fori_loop(0, H, fwd, jnp.zeros((n, tile), dtype))

            # phase 3: Mehrotra centering + corrector rhs (full arrays)
            sl = sl_s[...]
            su = su_s[...]
            zl = zl_s[...]
            zu = zu_s[...]
            du_aff = w1_s[...]
            r_dual = w2_s[...] - zl + zu
            dzl_aff = -zl - (zl / sl) * du_aff
            dzu_aff = -zu + (zu / su) * du_aff
            mu = (jnp.sum(sl * zl, axis=(0, 1))
                  + jnp.sum(su * zu, axis=(0, 1))) / N2
            a_p = jnp.minimum(max_step(sl, du_aff), max_step(su, -du_aff))
            a_d = jnp.minimum(max_step(zl, dzl_aff), max_step(zu, dzu_aff))
            mu_aff = (
                jnp.sum((sl + a_p * du_aff) * (zl + a_d * dzl_aff),
                        axis=(0, 1))
                + jnp.sum((su - a_p * du_aff) * (zu + a_d * dzu_aff),
                          axis=(0, 1))) / N2
            sigma = (mu_aff / jnp.maximum(mu, 1e-30)) ** 3
            rc_l = sigma * mu - du_aff * dzl_aff - zl * sl
            rc_u = sigma * mu + du_aff * dzu_aff - zu * su
            w2_s[...] = r_dual - rc_l / sl + rc_u / su

            # phase 4: corrector backward (k2 overwrites rhs in w2)
            def bwd2(hh, v):
                h = H - 1 - hh
                At = _ld(A_s, h)
                Bt = _ld(B_s, h)
                w = _ld(w2_s, h) + _mTv(Bt, v)
                Lf, inv_d = _unpack_factor(_ld(G_s, h))
                k2 = _chol_apply(Lf, inv_d, w[:, None, :])[:, 0]
                _st(w2_s, h, k2)
                return _mTv(At, v) - _mTv(_ld(K_s, h), w)

            jax.lax.fori_loop(0, H, bwd2, jnp.zeros((n, tile), dtype))

            # phase 5: corrector forward (du overwrites k2; dxs stored)
            def fwd2(h, dx):
                At = _ld(A_s, h)
                Bt = _ld(B_s, h)
                du = -_mv(_ld(K_s, h), dx) - _ld(w2_s, h)
                dx1 = _mv(At, dx) + _mv(Bt, du)
                _st(w2_s, h, du)
                _st(dxs_s, h, dx1)
                return dx1

            jax.lax.fori_loop(0, H, fwd2, jnp.zeros((n, tile), dtype))

            # phase 6: step sizes + state update (trajectory is affine in u)
            du = w2_s[...]
            dzl = (rc_l - zl * du) / sl
            dzu = (rc_u + zu * du) / su
            a_p = jnp.minimum(max_step(sl, du), max_step(su, -du))
            a_d = jnp.minimum(max_step(zl, dzl), max_step(zu, dzu))
            u_s[...] = u_s[...] + a_p * du
            xs_s[...] = xs_s[...] + a_p * dxs_s[...]
            sl_s[...] = sl + a_p * du
            su_s[...] = su - a_p * du
            zl_s[...] = zl + a_d * dzl
            zu_s[...] = zu + a_d * dzu
            return carry

        jax.lax.fori_loop(0, iters, iter_body, 0)

        # ---- clip + final consistent rollout ------------------------------
        LBf = jnp.broadcast_to(lb[None, :, None], (H, m, tile))
        UBf = jnp.broadcast_to(ub[None, :, None], (H, m, tile))
        u_s[...] = jnp.clip(u_s[...], LBf, UBf)
        u_out[...] = u_s[...]

        def roll1(h, x):
            x1 = (_mv(_ld(A_s, h), x)
                  + _mv(_ld(B_s, h), _ld(u_s, h)) + _ld(c_ref, h))
            _st(xs_out, h, x1)
            return x1

        jax.lax.fori_loop(0, H, roll1, x0v)

    def fn(A, Bm, c, *rest):
        it = iter(rest)
        x_ref = next(it) if with_xref else None
        u_ref = next(it) if with_uref else None
        x0, Q, QN, R, lb, ub = it
        B = A.shape[-1]
        assert B % tile == 0, f"batch {B} not a multiple of tile {tile}"
        tiles = B // tile
        dtype = A.dtype
        lb2 = jnp.asarray(lb, dtype).reshape(m, 1)
        ub2 = jnp.asarray(ub, dtype).reshape(m, 1)
        ref_inputs = []
        ref_specs = []
        if with_xref:
            ref_inputs.append(jnp.broadcast_to(x_ref, (H, n, B)).astype(dtype))
            ref_specs.append(pl.BlockSpec((H, n, tile), lambda i: (0, 0, i)))
        if with_uref:
            ref_inputs.append(jnp.broadcast_to(u_ref, (H, m, B)).astype(dtype))
            ref_specs.append(pl.BlockSpec((H, m, tile), lambda i: (0, 0, i)))
        u, xs = pl.pallas_call(
            kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((H, n, n, tile), lambda i: (0, 0, 0, i)),
                pl.BlockSpec((H, n, m, tile), lambda i: (0, 0, 0, i)),
                pl.BlockSpec((H, n, tile), lambda i: (0, 0, i)),
                *ref_specs,
                pl.BlockSpec((n, tile), lambda i: (0, i)),
                pl.BlockSpec((n, n), lambda i: (0, 0)),
                pl.BlockSpec((n, n), lambda i: (0, 0)),
                pl.BlockSpec((m, m), lambda i: (0, 0)),
                pl.BlockSpec((m, 1), lambda i: (0, 0)),
                pl.BlockSpec((m, 1), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((H, m, tile), lambda i: (0, 0, i)),
                pl.BlockSpec((H, n, tile), lambda i: (0, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, m, B), dtype),
                jax.ShapeDtypeStruct((H, n, B), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, m, n, tile), dtype),   # K gains
                pltpu.VMEM((H, m, m, tile), dtype),   # packed Cholesky factors of G
                pltpu.VMEM((H, m, tile), dtype),      # u
                pltpu.VMEM((H, m, tile), dtype),      # sl
                pltpu.VMEM((H, m, tile), dtype),      # su
                pltpu.VMEM((H, m, tile), dtype),      # zl
                pltpu.VMEM((H, m, tile), dtype),      # zu
                pltpu.VMEM((H, n, tile), dtype),      # xs tracked
                pltpu.VMEM((H, m, tile), dtype),      # w1: k_aff → du_aff
                pltpu.VMEM((H, m, tile), dtype),      # w2: grad → rhs → du
                pltpu.VMEM((H, n, tile), dtype),      # dxs
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(A, Bm, c, *ref_inputs, x0, Q.astype(dtype), QN.astype(dtype),
          R.astype(dtype), lb2, ub2)
        return u, xs

    return fn

"""Pallas kernel: batch-in-lanes Cholesky factor+solve for tiny SPD systems.

The MPC hot loop solves H·50·2 SPD systems of size n ∈ {6, 12} per scenario
per interior-point iteration (ctrl/riccati.py small_chol_solve — the TPU
counterpart of the reference's fixed-size template solves,
mat_cholesky.hpp:426).  This kernel keeps the whole unrolled
factor+substitution in VMEM with the scenario batch laid out on hardware
(sublane, lane) = (8, 128) tiles, so every scalar of the n³/6 recurrence is a
full-width VPU op and nothing round-trips through HBM between steps.

Layout contract (matches kte/soa.py batch-in-lanes):
    G:   (n, n, B)  SPD per lane-column
    rhs: (n, B)
    x:   (n, B)     with  G[:, :, b] @ x[:, b] = rhs[:, b]
B must be a multiple of 1024 (one (8, 128) tile per grid step); pad the
scenario batch or fall back to math.linalg.small_chol_solve otherwise
(`solve` below dispatches automatically).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 8 * 128  # one fp32 VPU tile of scenarios per grid step


def _kernel(n: int, G_ref, r_ref, x_ref):
    """Unrolled Cholesky + forward/backward substitution on (8, 128) tiles.

    G_ref: (n, n, 8, 128), r_ref/x_ref: (n, 8, 128).  The n×n recurrence is
    Python-unrolled (static n), each step a full-tile VPU op.
    """
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = G_ref[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jax.lax.rsqrt(s)
        inv_diag[j] = d
        L[j][j] = s * d  # sqrt(s)
        for i in range(j + 1, n):
            t = G_ref[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * d

    # forward substitution: L y = r
    y = [None] * n
    for i in range(n):
        t = r_ref[i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t * inv_diag[i]
    # backward substitution: Lᵀ x = y
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x_ref[k]
        x_ref[i] = t * inv_diag[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lanes(G, rhs, interpret: bool = False):
    """Pallas path: G (n, n, B), rhs (n, B) with B % 1024 == 0 → x (n, B).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests)."""
    n, _, B = G.shape
    assert B % _TILE == 0, f"batch {B} must be a multiple of {_TILE}"
    nt = B // _TILE
    Gt = G.reshape(n, n, nt * 8, 128)
    rt = rhs.reshape(n, nt * 8, 128)
    out = pl.pallas_call(
        functools.partial(_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n, nt * 8, 128), G.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((n, n, 8, 128), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, 8, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Gt, rt)
    return out.reshape(n, B)


def _kernel_multi(n: int, k: int, G_ref, r_ref, x_ref):
    """Factor once, substitute k right-hand-side columns.

    G_ref: (n, n, 8, 128), r_ref/x_ref: (n, k, 8, 128)."""
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = G_ref[j, j]
        for kk in range(j):
            s = s - L[j][kk] * L[j][kk]
        d = jax.lax.rsqrt(s)
        inv_diag[j] = d
        L[j][j] = s * d
        for i in range(j + 1, n):
            t = G_ref[i, j]
            for kk in range(j):
                t = t - L[i][kk] * L[j][kk]
            L[i][j] = t * d

    for c in range(k):
        y = [None] * n
        for i in range(n):
            t = r_ref[i, c]
            for kk in range(i):
                t = t - L[i][kk] * y[kk]
            y[i] = t * inv_diag[i]
        x = [None] * n
        for i in reversed(range(n)):
            t = y[i]
            for kk in range(i + 1, n):
                t = t - L[kk][i] * x[kk]
            x[i] = t * inv_diag[i]
            x_ref[i, c] = x[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_lanes_multi(G, rhs, interpret: bool = False):
    """Multi-RHS lanes kernel: G (n, n, B), rhs (n, k, B), B % 1024 == 0
    → x (n, k, B) with G[:, :, b] @ x[:, c, b] = rhs[:, c, b]."""
    n, _, B = G.shape
    k = rhs.shape[1]
    assert B % _TILE == 0, f"batch {B} must be a multiple of {_TILE}"
    nt = B // _TILE
    Gt = G.reshape(n, n, nt * 8, 128)
    rt = rhs.reshape(n, k, nt * 8, 128)
    out = pl.pallas_call(
        functools.partial(_kernel_multi, n, k),
        out_shape=jax.ShapeDtypeStruct((n, k, nt * 8, 128), G.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((n, n, 8, 128), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, 8, 128), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, k, 8, 128), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Gt, rt)
    return out.reshape(n, k, B)


# ---------------------------------------------------------------------------
# batch-aware dispatch: under vmap over a tiling scenario batch, route to the
# lanes kernel; unbatched / non-tiling / CPU falls back to the unrolled jnp
# path.  This is how the Riccati PDIP hot loop (ctrl/riccati.py) reaches
# Pallas without knowing about the batch axis.
# ---------------------------------------------------------------------------

FORCE_INTERPRET = False  # test hook: take the Pallas path in interpret mode


@jax.custom_batching.custom_vmap
def chol_solve_auto(G, rhs):
    """SPD solve G x = rhs with matrix rhs (n, k).  When vmapped over a batch
    that tiles the (8, 128) VPU lanes on TPU, dispatches to the Pallas kernel
    (ref counterpart: mat_cholesky.hpp:426 fixed-size solves)."""
    from reak_tpu.math.linalg import small_chol_solve

    return small_chol_solve(G, rhs)


@chol_solve_auto.def_vmap
def _chol_solve_auto_vmap(axis_size, in_batched, G, rhs):
    from reak_tpu.math.linalg import small_chol_solve

    gb, rb = in_batched
    if not gb:
        G = jnp.broadcast_to(G[None], (axis_size,) + G.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    n = G.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if (FORCE_INTERPRET or on_tpu) and axis_size % _TILE == 0 and n <= 16 \
            and G.ndim == 3:
        Gl = jnp.moveaxis(G, 0, -1)  # (n, n, B)
        rl = jnp.moveaxis(rhs, 0, -1)  # (n, k, B)
        out = solve_lanes_multi(Gl, rl, interpret=FORCE_INTERPRET)
        return jnp.moveaxis(out, -1, 0), True
    return small_chol_solve(G, rhs), True


def solve(G, rhs):
    """Batched SPD solve, standard layout: G (B, n, n), rhs (B, n) → (B, n).

    Dispatches to the Pallas lanes kernel when the batch tiles evenly and a
    TPU backend is active; otherwise falls back to the unrolled jnp path
    (math.linalg.small_chol_solve)."""
    from reak_tpu.math.linalg import small_chol_solve

    B, n, _ = G.shape
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or B % _TILE != 0 or n > 16:
        return small_chol_solve(G, rhs)
    Gl = jnp.moveaxis(G, 0, -1)      # (n, n, B)
    rl = jnp.moveaxis(rhs, 0, -1)    # (n, B)
    return jnp.moveaxis(solve_lanes(Gl, rl), -1, 0)

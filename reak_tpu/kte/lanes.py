"""Dense-lanes KTE rollout + LTV linearization — compact-graph TPU hot path.

The register-form SoA module (kte/soa.py) emits one HLO op per scalar
multiply-add; its flagship scan body is ~10k ops, which XLA-CPU takes minutes
to optimize (the round-2 "4-5 minute compile" problem) and XLA-TPU several
tens of seconds.  This module computes the SAME math in the same
batch-LAST ("lanes") layout, but with the small structural dims (body, dof,
xyz) stacked into array axes so every assembly step is one einsum /
broadcast-multiply-reduce: the scan body drops to a few hundred HLO ops while
every contraction still reduces only tiny leading axes and keeps the scenario
batch on full VPU lanes.

Chain topology constants (axes, offsets, masks, inertias) fold into the trace
at closure time, exactly like kte/soa.py.  Fixed-base revolute/prismatic
chains only — the MPC benchmark regime; free-base flows stay on the generic
kte/dynamics.py path.

The nv x nv mass-matrix solves dispatch to the Pallas batch-in-lanes Cholesky
(ops/chol_lanes.py) on TPU, putting the kernel on the rollout path as well as
the Riccati-PDIP path.

Equivalence with kte/soa.py (same sweeps as the reference's
kte_map_chain.hpp:71-89 / mass_matrix_calculator.cpp:80-287 /
manipulator_model.cpp:292-355) is asserted in tests/test_lanes_rollout.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.kte.spec import ChainSpec, JointType, PRISMATIC, FIXED
from reak_tpu.kte.soa import _fk_soa


# ---------------------------------------------------------------------------
# lanes-layout vector helpers: component axis at -2, batch axis last
# ---------------------------------------------------------------------------


def _cross_l(a, b):
    """Cross product over axis -2 (size 3); a, b (..., 3, B) broadcastable."""
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
    )


def _qrot_inv_l(q, v):
    """Rotate v by q⁻¹: q (..., 4, B), v (..., 3, B) → (..., 3, B)."""
    w = q[..., 0:1, :]
    qv = -q[..., 1:4, :]  # conjugate
    t = 2.0 * _cross_l(qv, v)
    return v + w * t + _cross_l(qv, t)


def _bcast_stack(items, batch_shape, dtype):
    """Stack a list of tuples of ((B,) array | float) → (len, k, *batch)."""
    rows = []
    for it in items:
        comps = [
            jnp.broadcast_to(jnp.asarray(c, dtype), batch_shape) for c in it
        ]
        rows.append(jnp.stack(comps, axis=0))
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# mass matrix + bias force in dense lanes form
# ---------------------------------------------------------------------------


def make_terms_lanes(spec: ChainSpec):
    """terms(q, qd) → (M (nv, nv, B), f (nv, B)); q, qd (nv, B).

    Same quantities as kte/soa.make_terms_soa (M = JᵀMcmJ twist-shaped mass,
    f = applied-minus-bias generalized force; ref
    mass_matrix_calculator.cpp:80-287, inertia.cpp:111-121), assembled as
    einsums over stacked (body, dof, xyz) axes.
    """
    if spec.has_free_base:
        raise NotImplementedError("lanes path: fixed-base chains only")
    nb = spec.n_joints
    nv = spec.nv

    # static structure, folded at trace time
    jidx = [i for i, t in enumerate(spec.joint_types) if JointType(t) != FIXED]
    assert len(jidx) == nv
    mask_np = np.array(
        [[1.0 if jidx[k] <= b else 0.0 for k in range(nv)] for b in range(nb)]
    )
    is_pri_np = np.array(
        [1.0 if JointType(spec.joint_types[i]) == PRISMATIC else 0.0 for i in jidx]
    )
    masses_np = np.asarray(spec.masses)
    I_np = np.asarray(spec.inertias).reshape(nb, 3, 3)
    grav_np = np.asarray(spec.gravity)
    stiff_np = np.array([spec.stiffness[i] for i in jidx])
    rest_np = np.array([spec.rest_q[i] for i in jidx])
    damp_np = np.array([spec.damping[i] for i in jidx])

    def jac_map(q):
        """q (nv, B) → Jv (nb, nv, 3, B) world, Jw (nb, nv, 3, B) body."""
        dtype = q.dtype
        batch = q.shape[1:]
        fkr = _fk_soa(spec, tuple(q[i] for i in range(nv)))
        coms = _bcast_stack(fkr.com, batch, dtype)  # (nb, 3, B)
        quats = _bcast_stack(fkr.quat, batch, dtype)  # (nb, 4, B)
        anchors = _bcast_stack([fkr.anchors[i] for i in jidx], batch, dtype)
        axes_g = _bcast_stack([fkr.axes_g[i] for i in jidx], batch, dtype)

        mask = jnp.asarray(mask_np, dtype)[:, :, None, None]
        is_pri = jnp.asarray(is_pri_np, dtype)[None, :, None, None]

        r = coms[:, None] - anchors[None]  # (nb, nv, 3, B)
        Jv_rev = _cross_l(axes_g[None], r)
        Jv = (is_pri * axes_g[None] + (1.0 - is_pri) * Jv_rev) * mask
        ax_rev = axes_g * (1.0 - jnp.asarray(is_pri_np, dtype)[:, None, None])
        Jw = _qrot_inv_l(quats[:, None], ax_rev[None]) * mask
        return Jv, Jw

    def vel_map(q, qd):
        Jv, Jw = jac_map(q)
        v = jnp.einsum("bkcz,kz->bcz", Jv, qd)
        w = jnp.einsum("bkcz,kz->bcz", Jw, qd)
        return v, w, Jv, Jw

    def terms(q, qd):
        dtype = q.dtype
        masses = jnp.asarray(masses_np, dtype)
        I_all = jnp.asarray(I_np, dtype)
        # one jvp gives J̇q̇ bias accelerations (kte/dynamics.py trick)
        (v, w, Jv, Jw), (a_b, al_b, _, _) = jax.jvp(
            lambda qq: vel_map(qq, qd), (q,), (qd,)
        )
        M = jnp.einsum("b,bkcz,blcz->klz", masses, Jv, Jv) + jnp.einsum(
            "bkrz,brc,blcz->klz", Jw, I_all, Jw
        )
        a_tot = a_b - jnp.asarray(grav_np, dtype)[None, :, None]
        f_lin = -masses[:, None, None] * a_tot
        Iw = jnp.einsum("brc,bcz->brz", I_all, w)
        Ial = jnp.einsum("brc,bcz->brz", I_all, al_b)
        f_ang = -(Ial + _cross_l(w, Iw))
        f = jnp.einsum("bkcz,bcz->kz", Jv, f_lin) + jnp.einsum(
            "bkcz,bcz->kz", Jw, f_ang
        )
        # passive joint springs/dampers (smooth part, hot path)
        f = (
            f
            - jnp.asarray(stiff_np, dtype)[:, None]
            * (q - jnp.asarray(rest_np, dtype)[:, None])
            - jnp.asarray(damp_np, dtype)[:, None] * qd
        )
        return M, f

    return terms


# ---------------------------------------------------------------------------
# fused rollout + LTV linearization
# ---------------------------------------------------------------------------


def make_rollout_ltv_lanes(spec: ChainSpec, dt: float, horizon: int,
                           order: int = 4):
    """Fused nominal rollout + LTV linearization, lanes-native I/O.

    Returns ``fn(x0 (B, 2nv), us (B, H, m)) → (A_seq (H, n, n, B),
    B_seq (H, n, m, B), c_seq (H, n, B), xs (H, n, B))`` with n = 2nv — i.e.
    directly in the layout ctrl/riccati_soa consumes, no transposes between
    rollout and PDIP.  Same step map as kte/soa.make_rollout_ltv_soa: one
    ``jax.linearize`` of the (M, f) assembly, n unit-tangent pulls batched by
    vmap, ∂q̈ = M⁻¹(∂f − ∂M q̈), exponential-series discretization of the
    frozen linearization (exact RK4-on-LTI).
    """
    from reak_tpu.ctrl.riccati_soa import _chol_solve_lanes, _mm, _mv

    nv = spec.nv
    n = 2 * nv
    terms = make_terms_lanes(spec)

    def step(x, u):
        """x (n, B), u (nv, B) → Ad (n, n, B), Bd (n, m, B), cd, x_new."""
        dtype = x.dtype

        def terms_flat(xx):
            return terms(xx[:nv], xx[nv:])

        (M, f), lin_fn = jax.linearize(terms_flat, x)
        qd = x[nv:]
        f_tau = f + u
        qdd = _chol_solve_lanes(M, f_tau[:, None, :])[:, 0]  # (nv, B)

        # all n unit-tangent pulls in one vmapped pass over the linear map
        # (+0·x ties the basis to the primal's varying axes under shard_map)
        basis = jnp.eye(n, dtype=dtype)[:, :, None] + 0.0 * x[None]
        dM, df = jax.vmap(lin_fn)(basis)  # (n, nv, nv, B), (n, nv, B)
        rhs = df - jnp.einsum("dklz,lz->dkz", dM, qdd)  # (n, nv, B)
        rhs_t = jnp.moveaxis(rhs, 0, 1)  # (nv, n, B)
        eye_nv = jnp.broadcast_to(
            jnp.eye(nv, dtype=dtype)[:, :, None], (nv, nv) + x.shape[1:]
        )
        sol = _chol_solve_lanes(M, jnp.concatenate([rhs_t, eye_nv], axis=1))
        dqdd = sol[:, :n]  # (nv, n, B): ∂q̈_k/∂x_d
        Minv = sol[:, n:]  # (nv, nv, B)

        # continuous A = [[0, I], [∂q̈/∂q, ∂q̈/∂q̇]], B = [[0], [M⁻¹]]
        top = jnp.concatenate(
            [jnp.zeros((nv, nv), dtype), jnp.eye(nv, dtype=dtype)], axis=1
        )[:, :, None]
        A_c = jnp.concatenate([jnp.broadcast_to(top, (nv, n) + x.shape[1:]),
                               dqdd], axis=0)  # (n, n, B)
        B_c = jnp.concatenate(
            [jnp.zeros((nv, nv) + x.shape[1:], dtype), Minv], axis=0
        )  # (n, nv, B)
        f0 = jnp.concatenate([qd, qdd], axis=0)  # (n, B)

        # S = Σ_{k=1..order} dt^k A^{k-1}/k!;  Ad = I + A S;  Bd = S B
        eye_n = jnp.eye(n, dtype=dtype)[:, :, None]
        S = eye_n * dt
        term = eye_n * dt
        for k in range(2, order + 1):
            term = (dt / k) * _mm(A_c, term)
            S = S + term
        Ad = eye_n + _mm(A_c, S)
        Bd = _mm(S, B_c)
        x_new = x + _mv(S, f0)
        cd = x_new - _mv(Ad, x) - _mv(Bd, u)
        return Ad, Bd, cd, x_new

    def rollout(x0, us):
        x = x0.T  # (n, B)
        us_t = jnp.moveaxis(us, 0, -1)  # (H, m, B)

        def body(x, u_t):
            Ad, Bd, cd, x_new = step(x, u_t)
            return x_new, (Ad, Bd, cd, x_new)

        _, seqs = jax.lax.scan(body, x, us_t)
        return seqs  # (H, n, n, B), (H, n, m, B), (H, n, B), (H, n, B)

    return rollout


def make_rollout_ltv_fullfused(spec: ChainSpec, dt: float, horizon: int,
                               order: int = 4, tile: int = None,
                               interpret: bool = None):
    """Rollout with the ENTIRE step (core + series discretization) in one
    Pallas kernel (ops/kte_core_pallas.make_step_lanes) — the scan body is
    a single kernel launch; same contract as make_rollout_ltv_lanes."""
    from reak_tpu.ops import kte_core_pallas as kcp

    if tile is None:
        tile = kcp._TILE
    step = kcp.make_step_lanes(spec, dt, order=order, tile=tile,
                               interpret=interpret)

    def rollout(x0, us):
        x = x0.T
        us_t = jnp.moveaxis(us, 0, -1)

        def body(x, u_t):
            Ad, Bd, cd, x_new = step(x, u_t)
            return x_new, (Ad, Bd, cd, x_new)

        _, seqs = jax.lax.scan(body, x, us_t)
        return seqs

    return rollout


def make_rollout_ltv_fused(spec: ChainSpec, dt: float, horizon: int,
                           order: int = 4, tile: int = None,
                           interpret: bool = None):
    """Rollout + LTV with the step core in ONE fused Pallas kernel
    (ops/kte_core_pallas.py — the SURVEY §2.24 twist-shaping + mass-assembly
    + factor + linearize kernel); the exponential-series tail and output
    stacking stay in XLA (a handful of (n, n, B) lanes matmuls).

    Same contract as make_rollout_ltv_lanes: ``fn(x0 (B, n), us (B, H, m)) →
    (A (H,n,n,B), B (H,n,m,B), c (H,n,B), xs (H,n,B))``.  B must be a
    multiple of the kernel tile (512).
    """
    from reak_tpu.ops import kte_core_pallas as kcp
    from reak_tpu.ctrl.riccati_soa import _mm, _mv

    nv = spec.nv
    n = 2 * nv
    if tile is None:
        tile = kcp._TILE
    core = kcp.make_core_lanes(spec, tile=tile, interpret=interpret)

    def step(x, u):
        """x (n, B), u (nv, B) → lanes-layout LTV blocks + next state."""
        dtype = x.dtype
        qd = x[nv:]
        qdd, dqdd, minv = core(x, u)
        top = jnp.concatenate(
            [jnp.zeros((nv, nv), dtype), jnp.eye(nv, dtype=dtype)], axis=1
        )[:, :, None]
        A_c = jnp.concatenate(
            [jnp.broadcast_to(top, (nv, n) + x.shape[1:]), dqdd], axis=0)
        B_c = jnp.concatenate(
            [jnp.zeros((nv, nv) + x.shape[1:], dtype), minv], axis=0)
        f0 = jnp.concatenate([qd, qdd], axis=0)
        eye_n = jnp.eye(n, dtype=dtype)[:, :, None]
        S = eye_n * dt
        term = eye_n * dt
        for k in range(2, order + 1):
            term = (dt / k) * _mm(A_c, term)
            S = S + term
        Ad = eye_n + _mm(A_c, S)
        Bd = _mm(S, B_c)
        x_new = x + _mv(S, f0)
        cd = x_new - _mv(Ad, x) - _mv(Bd, u)
        return Ad, Bd, cd, x_new

    def rollout(x0, us):
        x = x0.T
        us_t = jnp.moveaxis(us, 0, -1)

        def body(x, u_t):
            Ad, Bd, cd, x_new = step(x, u_t)
            return x_new, (Ad, Bd, cd, x_new)

        _, seqs = jax.lax.scan(body, x, us_t)
        return seqs

    return rollout


def make_rollout_ltv_batchfirst(spec: ChainSpec, dt: float, horizon: int,
                                order: int = 4):
    """Batch-first wrapper with the kte/soa.make_rollout_ltv_soa signature:
    ``fn(x0 (B, n), us (B, H, m)) → (A (B,H,n,n), B, c, xs (B,H,n))`` —
    used by equivalence tests and drop-in callers."""
    roll = make_rollout_ltv_lanes(spec, dt, horizon, order)

    def fn(x0, us):
        A_l, B_l, c_l, xs_l = roll(x0, us)
        # (H, ..., B) → (B, H, ...)
        perm = lambda a: jnp.moveaxis(a, -1, 0)
        return perm(A_l), perm(B_l), perm(c_l), perm(xs_l)

    return fn

"""Batch-in-lanes Riccati PDIP (ctrl/riccati_soa.py) — numerical equivalence
with the per-scenario vmapped solver (ctrl/riccati.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.ctrl import riccati, riccati_soa


def _random_ltv(rng, H=12, n=4, m=2, B=5):
    # stable-ish random LTV systems
    A = jnp.asarray(0.95 * np.stack(
        [np.eye(n) + 0.05 * rng.standard_normal((H, n, n))[h] for h in range(H)]
    ))[None].repeat(B, 0) + 0.01 * jnp.asarray(rng.standard_normal((B, H, n, n)))
    Bm = jnp.asarray(0.1 * rng.standard_normal((B, H, n, m)))
    c = jnp.asarray(0.01 * rng.standard_normal((B, H, n)))
    x0 = jnp.asarray(rng.standard_normal((B, n)))
    return A, Bm, c, x0


def test_soa_matches_vmapped_solver(rng):
    H, n, m, B = 12, 4, 2, 5
    A, Bm, c, x0 = _random_ltv(rng, H, n, m, B)
    Q = jnp.eye(n) * 2.0
    QN = jnp.eye(n) * 5.0
    R = jnp.eye(m) * 0.1
    lb = jnp.full(m, -0.7)
    ub = jnp.full(m, 0.7)

    u_ref, x_ref = jax.vmap(
        lambda a, b, cc, x: riccati.solve_box_mpc_riccati(
            a, b, cc, Q, QN, R, x, lb, ub, iters=12)
    )(A, Bm, c, x0)

    ul, xl = riccati_soa.solve_box_mpc_riccati_soa(
        jnp.moveaxis(A, 0, -1), jnp.moveaxis(Bm, 0, -1),
        jnp.moveaxis(c, 0, -1), Q, QN, R, x0.T, lb, ub, iters=12)
    u_soa = jnp.moveaxis(ul, -1, 0)
    x_soa = jnp.moveaxis(xl, -1, 0)

    np.testing.assert_allclose(np.asarray(u_soa), np.asarray(u_ref),
                               atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x_soa), np.asarray(x_ref),
                               atol=1e-8, rtol=1e-6)
    # some constraints active, none violated
    assert bool(jnp.any(jnp.abs(u_soa) > 0.69))
    assert bool(jnp.all(jnp.abs(u_soa) <= 0.7 + 1e-9))


def test_backward_pass_matches(rng):
    H, n, m, B = 8, 4, 2, 3
    A, Bm, _, _ = _random_ltv(rng, H, n, m, B)
    Q = jnp.eye(n)
    QN = jnp.eye(n) * 3.0
    Rs = jnp.asarray(rng.uniform(0.5, 2.0, (B, H, m))[:, :, :, None]
                     * np.eye(m)) + jnp.eye(m) * 0.1

    bw = jax.vmap(lambda a, b, r: riccati.lqr_backward(a, b, Q, QN, r))(
        A, Bm, Rs)
    Ks, Gs = riccati_soa.lqr_backward_soa(
        jnp.moveaxis(A, 0, -1), jnp.moveaxis(Bm, 0, -1), Q, QN,
        jnp.moveaxis(Rs, 0, -1))
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(Ks, -1, 0)),
                               np.asarray(bw.Ks), atol=1e-9)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(Gs, -1, 0)),
                               np.asarray(bw.Gs), atol=1e-9)


def test_make_kte_mpc_layouts_agree(rng):
    from reak_tpu.kte import models
    from reak_tpu.ctrl import mpc

    spec = models.planar_2link()
    prob = mpc.MPCProblem(
        Q=jnp.diag(jnp.array([10.0, 10.0, 1.0, 1.0])),
        R=jnp.eye(2) * 0.05,
        QN=jnp.diag(jnp.array([50.0, 50.0, 5.0, 5.0])),
        u_min=jnp.full(2, -3.0), u_max=jnp.full(2, 3.0), horizon=8)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 4)))
    us0 = jnp.zeros((4, 8, 2))
    u_l, x_l = jax.jit(mpc.make_kte_mpc(spec, prob, 0.02, qp_iters=6,
                                        qp_layout="lanes"))(x0s, us0)
    u_v, x_v = jax.jit(mpc.make_kte_mpc(spec, prob, 0.02, qp_iters=6,
                                        qp_layout="vmap"))(x0s, us0)
    np.testing.assert_allclose(np.asarray(u_l), np.asarray(u_v),
                               atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x_l), np.asarray(x_v),
                               atol=1e-8, rtol=1e-6)


def test_fused_pdip_matches_unfused_f64(rng):
    """Scan-fused Mehrotra PDIP (4 scans/iter) is numerically identical to
    the 7-scan version, including x_ref/u_ref tracking (VERDICT r2 item 1
    'fuse what dominates')."""
    from reak_tpu.ctrl.riccati_soa import (solve_box_mpc_riccati_soa,
                                           solve_box_mpc_riccati_soa_fused)

    H, n, m, B = 12, 4, 2, 5
    A = jnp.asarray(rng.standard_normal((H, n, n, B)) * 0.1
                    + np.eye(n)[None, :, :, None])
    Bm = jnp.asarray(rng.standard_normal((H, n, m, B)) * 0.2)
    c = jnp.asarray(rng.standard_normal((H, n, B)) * 0.05)
    x0 = jnp.asarray(rng.standard_normal((n, B)))
    Q = jnp.eye(n)
    QN = jnp.eye(n) * 5.0
    R = jnp.eye(m) * 0.1
    lb, ub = jnp.full(m, -1.5), jnp.full(m, 1.5)
    xr = jnp.asarray(rng.standard_normal((H, n, B)) * 0.1)
    ur = jnp.asarray(rng.standard_normal((H, m, B)) * 0.1)
    for kw in ({}, dict(x_ref=xr, u_ref=ur)):
        u1, x1 = solve_box_mpc_riccati_soa(A, Bm, c, Q, QN, R, x0, lb, ub,
                                           iters=12, **kw)
        u2, x2 = solve_box_mpc_riccati_soa_fused(A, Bm, c, Q, QN, R, x0, lb,
                                                 ub, iters=12, **kw)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                                   rtol=1e-10, atol=1e-12)


def test_pdip_pallas_pass_kernels_match_scan(rng, monkeypatch):
    """The whole-pass Pallas kernels (riccati_bwd_pallas: fused backward,
    corrector backward, closed-loop forward) are byte-identical to the
    lax.scan path — checked in interpret mode at f64."""
    import reak_tpu.ops.riccati_bwd_pallas as rbp
    from reak_tpu.ctrl.riccati_soa import solve_box_mpc_riccati_soa_fused

    monkeypatch.setattr(rbp, "_TILE", 2)
    monkeypatch.setattr(rbp, "FORCE_INTERPRET", True)
    H, n, m, B = 6, 4, 2, 4
    A = jnp.asarray(rng.standard_normal((H, n, n, B)) * 0.1
                    + np.eye(n)[None, :, :, None])
    Bm = jnp.asarray(rng.standard_normal((H, n, m, B)) * 0.2)
    c = jnp.asarray(rng.standard_normal((H, n, B)) * 0.05)
    x0 = jnp.asarray(rng.standard_normal((n, B)))
    Q, QN, R = jnp.eye(n), jnp.eye(n) * 5.0, jnp.eye(m) * 0.1
    lb, ub = jnp.full(m, -1.5), jnp.full(m, 1.5)
    u1, x1 = solve_box_mpc_riccati_soa_fused(A, Bm, c, Q, QN, R, x0, lb, ub,
                                             iters=6, use_kernels="never")
    u2, x2 = solve_box_mpc_riccati_soa_fused(A, Bm, c, Q, QN, R, x0, lb, ub,
                                             iters=6, use_kernels="auto")
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_pdip_whole_solve_kernel_matches_scan(rng, monkeypatch):
    """The whole-solve Pallas kernel (ops/pdip_whole_pallas: ALL interior-
    point iterations in one launch, VMEM-resident state) matches the
    lax.scan fused path — interpret mode, f64 byte-equality at convergence."""
    import reak_tpu.ops.pdip_whole_pallas as pwp
    from reak_tpu.ctrl.riccati_soa import solve_box_mpc_riccati_soa_fused

    monkeypatch.setattr(pwp, "_TILE", 2)
    monkeypatch.setattr(pwp, "FORCE_INTERPRET", True)
    H, n, m, B = 6, 4, 2, 4
    A = jnp.asarray(rng.standard_normal((H, n, n, B)) * 0.1
                    + np.eye(n)[None, :, :, None])
    Bm = jnp.asarray(rng.standard_normal((H, n, m, B)) * 0.2)
    c = jnp.asarray(rng.standard_normal((H, n, B)) * 0.05)
    x0 = jnp.asarray(rng.standard_normal((n, B)))
    Q, QN, R = jnp.eye(n), jnp.eye(n) * 5.0, jnp.eye(m) * 0.1
    lb, ub = jnp.full(m, -1.5), jnp.full(m, 1.5)
    xr = jnp.asarray(rng.standard_normal((H, n, B)) * 0.1)
    ur = jnp.asarray(rng.standard_normal((H, m, B)) * 0.1)
    # regulator, x_ref-tracking, and full x_ref+u_ref tracking variants
    # (the tracking kernel is what the error-state manifold MPC rides)
    for kw in ({}, dict(x_ref=xr), dict(x_ref=xr, u_ref=ur)):
        u1, x1 = solve_box_mpc_riccati_soa_fused(
            A, Bm, c, Q, QN, R, x0, lb, ub, iters=6, use_kernels="never",
            **kw)
        u2, x2 = solve_box_mpc_riccati_soa_fused(
            A, Bm, c, Q, QN, R, x0, lb, ub, iters=6, use_kernels="whole",
            **kw)
        assert np.max(np.abs(np.asarray(u1) - np.asarray(u2))) < 1e-9
        assert np.max(np.abs(np.asarray(x1) - np.asarray(x2))) < 1e-9

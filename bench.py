#!/usr/bin/env python
"""Headline benchmark: MPC solves/s/chip on the 6-DoF CRS-A465-style KTE arm,
horizon H=50 (BASELINE.json north star; target ≥ 5000 solves/s/chip).

One "solve" = the full per-scenario pipeline on device:
  whole-step Pallas rollout + LTV linearization (ops/kte_core_pallas.py
  make_step_lanes — dynamics core + series discretization in one kernel,
  (8, 128)-tile registers) → whole-solve Riccati interior-point box-QP
  (ops/pdip_whole_pallas.py — ALL Mehrotra iterations in one launch,
  VMEM-resident state).

Accounting (VERDICT r2 item 1):
  * phase_ms — rollout+linearize vs PDIP, measured separately with
    amortized-sync timing (chained async calls, ONE device pull at the end:
    per-rep scalar pulls through the tunneled backend add ~50-100 ms of link
    latency that is NOT device time);
  * flops_per_solve — per-STEP XLA cost analysis of the loop-free step /
    iteration bodies (XLA's cost model undercounts `scan` bodies, so each
    body is compiled standalone and multiplied by its trip count);
  * est_mfu — achieved FLOP/s vs the 197 TFLOP/s v5e bf16 MXU peak (the
    standard MFU denominator) and vs the ~3.9 TFLOP/s f32 VPU peak, which is
    where this elementwise-dominated pipeline actually executes;
  * hbm_gbps — analytic per-solve HBM traffic (array reads/writes of the
    scan-carried sequences; formula in _hbm_bytes_per_solve) over wall time.

Also writes PALLAS_r05.json: on-hardware numerics of both Pallas kernels
(lanes Cholesky + fused KTE step core) vs their XLA fallbacks.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import reak_tpu

# full-f32 contractions for the parity bars (explicit opt-in; ADVICE r4)
reak_tpu.enable_full_precision()

# persistent compile cache: cold fused-kernel compiles take ~1 min on the
# tunneled TPU; warm runs hit the cache
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

V5E_BF16_PEAK = 197e12   # MXU peak, the standard MFU denominator
V5E_VPU_F32_PEAK = 3.9e12  # 8x128 lanes x 4 ALUs x ~0.94 GHz (elementwise)
V5E_HBM_BPS = 819e9


def amortized(fn, args, reps):
    """Chained async calls + one forced scalar pull (relay-safe timing)."""
    s = float(fn(*args))  # compile + full sync
    assert np.isfinite(s)
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    s = float(out)  # drains the device queue
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / reps


def _hbm_bytes_per_solve(H, n, m, iters, whole_kernel=True):
    """Analytic main-memory traffic per scenario per solve (f32).

    ``whole_kernel=True`` (the TPU path, batch % 128 == 0): the fullfused
    rollout writes (A, B, c, xs) once; the whole-solve PDIP kernel
    (ops/pdip_whole_pallas.py) reads (A, B, c, x0) exactly ONCE — state,
    gains and Schur factors stay VMEM-resident across every iteration —
    and writes (u, xs).

    ``whole_kernel=False`` (scan/per-pass fallback: CPU, unaligned batch,
    or horizons past the VMEM bound): each PDIP iteration re-reads (A, B)
    in 4 passes, stage data in 2, and streams (K, G, k, grad, du, dx) —
    the round-3 accounting, a lower bound on that path's traffic."""
    f = 4  # bytes per f32
    roll = H * (n * n + n * m + 2 * n) * f
    if whole_kernel:
        pdip_reads = H * (n * n + n * m + n) * f + n * f
        outputs = H * (m + n) * f
        return roll + pdip_reads + outputs
    per_iter = (
        4 * H * (n * n + n * m) * f        # A,B read by 4 passes
        + 2 * H * (2 * n + 2 * m) * f      # qs/u/D/z reads
        + H * (m * n + m * m + 4 * m) * f  # K,G,k,grad writes
        + H * (2 * m + n) * f              # du, dx
    )
    return roll + iters * per_iter


def main():
    from reak_tpu.kte import models, lanes
    from reak_tpu.ctrl import mpc
    from reak_tpu.ctrl.riccati_soa import solve_box_mpc_riccati_soa_fused
    from reak_tpu.ops import chol_lanes, kte_core_pallas

    horizon = int(os.environ.get("BENCH_HORIZON", 50))
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    qp_iters = int(os.environ.get("BENCH_QP_ITERS", 8))
    reps = int(os.environ.get("BENCH_REPS", 10))
    dt = 0.01
    n, m = 12, 6

    spec = models.manip_3r3r()
    prob = mpc.MPCProblem(
        Q=jnp.diag(jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])),
        R=jnp.eye(m) * 0.05,
        QN=jnp.diag(jnp.concatenate([jnp.full(6, 50.0), jnp.full(6, 5.0)])),
        u_min=jnp.full(m, -40.0),
        u_max=jnp.full(m, 40.0),
        horizon=horizon,
    )

    solver = mpc.make_kte_mpc(spec, prob, dt, qp_iters=qp_iters, sqp_iters=1)
    step = jax.jit(lambda x0, u0: jnp.sum(solver(x0, u0)[0]))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.5, 0.5, (batch, 6)), rng.uniform(-0.2, 0.2, (batch, 6))],
            axis=1,
        ),
        dtype=jnp.float32,
    )
    u0 = jnp.zeros((batch, horizon, m), jnp.float32)

    t_full = amortized(step, (x0, u0), reps)
    solves_per_s = batch / t_full

    # ---- phase split -----------------------------------------------------
    on_tpu = jax.default_backend() == "tpu"
    roll = (lanes.make_rollout_ltv_fullfused(spec, dt, horizon)
            if on_tpu and batch % kte_core_pallas._TILE == 0
            else lanes.make_rollout_ltv_lanes(spec, dt, horizon))
    f_roll = jax.jit(lambda x, u: sum(jnp.sum(o) for o in roll(x, u)))
    t_roll = amortized(f_roll, (x0, u0), reps)
    A_l, B_l, c_l, _ = jax.jit(roll)(x0, u0)
    f_pdip = jax.jit(lambda A, Bm, c, xT: jnp.sum(
        solve_box_mpc_riccati_soa_fused(
            A, Bm, c, prob.Q, prob.QN, prob.R, xT, prob.u_min, prob.u_max,
            iters=qp_iters)[0]))
    t_pdip = amortized(f_pdip, (A_l, B_l, c_l, x0.T), reps)

    # ---- analytic FLOPs: per-step cost analysis x trip counts -------------
    # XLA's cost model cannot see inside pallas_call custom-calls, so the
    # counts come from the mathematically identical scan/XLA variants
    # (lanes rollout, use_kernels="never" PDIP) of the same pipeline.
    flops_per_solve = float("nan")
    try:
        # H=1 rollout is the loop-free step body; PDIP per-iteration flops
        # from the iters=2 − iters=1 difference (removes the shared pre/post)
        roll1 = lanes.make_rollout_ltv_lanes(spec, dt, 1)
        ca_roll = jax.jit(roll1).lower(x0, u0[:, :1]).compile().cost_analysis()
        f_pdip1 = jax.jit(lambda A, Bm, c, xT: jnp.sum(
            solve_box_mpc_riccati_soa_fused(
                A, Bm, c, prob.Q, prob.QN, prob.R, xT, prob.u_min,
                prob.u_max, iters=1, use_kernels="never")[0]))
        f_pdip2 = jax.jit(lambda A, Bm, c, xT: jnp.sum(
            solve_box_mpc_riccati_soa_fused(
                A, Bm, c, prob.Q, prob.QN, prob.R, xT, prob.u_min,
                prob.u_max, iters=2, use_kernels="never")[0]))
        ca1 = f_pdip1.lower(A_l, B_l, c_l, x0.T).compile().cost_analysis()
        ca2 = f_pdip2.lower(A_l, B_l, c_l, x0.T).compile().cost_analysis()
        fl_roll_step = ca_roll.get("flops", float("nan"))
        fl_iter = ca2.get("flops", float("nan")) - ca1.get("flops", float("nan"))
        fl_base = ca1.get("flops", float("nan")) - fl_iter
        flops_per_solve = (horizon * fl_roll_step
                           + qp_iters * fl_iter + fl_base) / batch
    except Exception:
        # keep the headline metric alive, but make the dropped sub-metric
        # visible instead of silently null (ADVICE r4)
        traceback.print_exc(file=sys.stderr)

    from reak_tpu.ops import pdip_whole_pallas as _pwp

    whole_kernel_used = (on_tpu and batch % _pwp._TILE == 0
                         and _pwp.fits_vmem(horizon, n, m))
    achieved_flops = flops_per_solve * solves_per_s
    bytes_per_solve = _hbm_bytes_per_solve(horizon, n, m, qp_iters,
                                           whole_kernel=whole_kernel_used)
    hbm_gbps = bytes_per_solve * solves_per_s / 1e9
    roofline_solves = V5E_HBM_BPS / bytes_per_solve

    # ---- Pallas kernel parity artifact ------------------------------------
    try:
        G = jnp.asarray(rng.standard_normal((6, 6, 1024)), jnp.float32)
        G = jnp.einsum("ikz,jkz->ijz", G, G) \
            + 3.0 * jnp.eye(6, dtype=jnp.float32)[:, :, None]
        rhs = jnp.asarray(rng.standard_normal((6, 18, 1024)), jnp.float32)
        out_k = jax.jit(lambda g, r: chol_lanes.solve_lanes_multi(g, r))(G, rhs)
        ref = jnp.linalg.solve(jnp.moveaxis(G, -1, 0), jnp.moveaxis(rhs, -1, 0))
        err_chol = float(jnp.max(jnp.abs(jnp.moveaxis(out_k, -1, 0) - ref)))

        xk = x0[:1024].T
        uk = u0[:1024, 0, :].T
        core_k = jax.jit(kte_core_pallas.make_core_lanes(spec))
        core_x = jax.jit(kte_core_pallas.make_core_lanes_xla(spec))
        errs = [float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(core_k(xk, uk), core_x(xk, uk))]
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "PALLAS_r05.json"), "w") as f:
            json.dump({
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "chol_lanes.solve_lanes_multi": {
                    "shape": "G(6,6,1024) rhs(6,18,1024)", "dtype": "float32",
                    "max_err_vs_f32_solve": err_chol},
                "kte_core_pallas.make_core_lanes": {
                    "shape": "x(12,1024) u(6,1024)", "dtype": "float32",
                    "max_err_vs_xla_fallback": {
                        "qdd": errs[0], "dqdd": errs[1], "minv": errs[2]}},
            }, f, indent=1)
    except Exception:
        traceback.print_exc(file=sys.stderr)

    # ---- BASELINE config 4: free-base belief-sampled scenario MPC --------
    # (satellite quaternion-state error-state MPC on the round-5 lanes fast
    # path — ctrl/manifold_lanes: exact imdt step + analytic error-state LTV
    # in lanes layout + whole-solve tracking PDIP kernel; VERDICT r4 item 1)
    free_base = None
    try:
        from reak_tpu.ctrl import mpc_manifold as mm, ss_systems as ss
        from reak_tpu.ctrl import manifold_lanes as ml

        fb_B = int(os.environ.get("BENCH_FREEBASE_BATCH", 8192))
        fb_H = 20
        params = ss.satellite3D(mass=10.0,
                                inertia=jnp.diag(jnp.asarray([4.0, 5.0, 6.0])))
        ret = ss.sat3D_retraction()
        w12 = jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])
        prob_fb = mpc.MPCProblem(
            Q=jnp.diag(w12), R=jnp.eye(6) * 0.05, QN=jnp.diag(10.0 * w12),
            u_min=jnp.full(6, -20.0), u_max=jnp.full(6, 20.0), horizon=fb_H)
        solver_fb = ml.make_sat_scenario_mpc_lanes(
            params, prob_fb, 0.1, qp_iters=qp_iters, sqp_iters=2)
        x_ref = ss.default_state().at[0:3].set(jnp.array([1.0, 0.5, -0.3]))
        from reak_tpu.ctrl.belief import GaussianBelief
        belief = GaussianBelief(ss.default_state(), 0.05 * jnp.eye(12))
        x0s = mm.sample_belief_states(jax.random.PRNGKey(0), belief, fb_B,
                                      ret=ret).astype(jnp.float32)
        u_init = jnp.zeros((fb_B, fb_H, 6), jnp.float32)
        fb_step = jax.jit(lambda xs, us: jnp.sum(
            solver_fb(xs, x_ref.astype(jnp.float32), us)[0]))
        t_fb = amortized(fb_step, (x0s, u_init), max(2, reps // 2))
        free_base = {
            "metric": "free_base_scenario_mpc_solves_per_s",
            "value": round(fb_B / t_fb, 1),
            "unit": "solves/s",
            "config": {"model": "satellite3D_imdt", "horizon": fb_H,
                       "scenarios": fb_B, "qp_iters": qp_iters,
                       "sqp_iters": 2, "state": "quaternion (error-state)",
                       "path": "lanes + whole-PDIP tracking kernel"},
        }
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        free_base = {"error": str(e)}

    # ---- free-base KTE CHAIN point: the floating manipulator (free base +
    # 6-DoF arm, nv=12, tangent d=24) on the lanes manifold SQP + tracking
    # kernel — the SSRMS-class regime the round-4 verdict flagged as off
    # the fast path entirely
    float_arm = None
    try:
        from reak_tpu.kte.lanes import make_kte_manifold_lanes
        from reak_tpu.ctrl import manifold_lanes as ml

        fa_spec = models.floating_arm()
        fa_B = int(os.environ.get("BENCH_FLOATARM_BATCH", 2048))
        fa_H = 16
        nv, nq = fa_spec.nv, fa_spec.nq
        w = jnp.concatenate([jnp.full(nv, 5.0), jnp.full(nv, 0.5)])
        prob_fa = mpc.MPCProblem(
            Q=jnp.diag(w), R=jnp.eye(nv) * 0.05, QN=jnp.diag(10.0 * w),
            u_min=jnp.full(nv, -30.0), u_max=jnp.full(nv, 30.0),
            horizon=fa_H)
        fstep, fltv = make_kte_manifold_lanes(fa_spec, 0.02)
        solver_fa = ml.make_scenario_mpc_lanes(
            fstep, fltv, prob_fa, tangent_dim=2 * nv, quat_index=3,
            qp_iters=qp_iters, sqp_iters=1)
        qr = rng.standard_normal((fa_B, 4)).astype(np.float32)
        qr /= np.linalg.norm(qr, axis=1, keepdims=True)
        x0f = np.zeros((fa_B, nq + nv), np.float32)
        x0f[:, 0:3] = 0.2 * rng.standard_normal((fa_B, 3))
        x0f[:, 3:7] = qr
        x0f[:, 7:nq] = 0.3 * rng.standard_normal((fa_B, nq - 7))
        x0f[:, nq:] = 0.1 * rng.standard_normal((fa_B, nv))
        xrf = np.zeros(nq + nv, np.float32)
        xrf[3] = 1.0
        f_fa = jax.jit(lambda a, b: jnp.sum(
            solver_fa(a, jnp.asarray(xrf), b)[0]))
        t_fa = amortized(f_fa, (jnp.asarray(x0f),
                                jnp.zeros((fa_B, fa_H, nv), jnp.float32)),
                         max(2, reps // 2))
        float_arm = {
            "metric": "floating_arm_scenario_mpc_solves_per_s",
            "value": round(fa_B / t_fa, 1),
            "unit": "solves/s",
            "config": {"model": "floating_arm (free base + 6-DoF arm)",
                       "nv": nv, "tangent_dim": 2 * nv, "horizon": fa_H,
                       "scenarios": fa_B, "qp_iters": qp_iters,
                       "sqp_iters": 1,
                       "path": "kte manifold lanes + tracking kernel"},
        }
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        float_arm = {"error": str(e)}

    # ---- H=128 long-horizon point: must stay on the whole-solve kernel
    # (VERDICT r4 item 2: no fall-back to per-pass kernels at H >= 128)
    h128 = None
    try:
        if on_tpu and _pwp.fits_vmem(128, n, m):
            B128 = 2048
            roll128 = (lanes.make_rollout_ltv_fullfused(spec, dt, 128)
                       if B128 % kte_core_pallas._TILE == 0
                       else lanes.make_rollout_ltv_lanes(spec, dt, 128))
            x0h = x0[:B128]
            u0h = jnp.zeros((B128, 128, m), jnp.float32)
            A_h, B_h, c_h, _ = jax.jit(roll128)(x0h, u0h)
            # use_kernels="whole" asserts the whole-kernel path is taken
            f_h128 = jax.jit(lambda A, Bm, c, xT: jnp.sum(
                solve_box_mpc_riccati_soa_fused(
                    A, Bm, c, prob.Q, prob.QN, prob.R, xT, prob.u_min,
                    prob.u_max, iters=qp_iters, use_kernels="whole")[0]))
            t_h128 = amortized(f_h128, (A_h, B_h, c_h, x0h.T),
                               max(2, reps // 2))
            h128 = {"horizon": 128, "batch": B128,
                    "pdip_ms": round(t_h128 * 1e3, 2),
                    "pdip_solves_per_s": round(B128 / t_h128, 1),
                    "whole_kernel": True}
        else:
            h128 = {"skipped": "not on TPU or fits_vmem(128) false"}
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        h128 = {"error": str(e)}

    target = 5000.0
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip_6dof_H50",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / target, 3),
                "phase_ms": {"rollout_linearize": round(t_roll * 1e3, 2),
                             "riccati_pdip": round(t_pdip * 1e3, 2),
                             "full": round(t_full * 1e3, 2)},
                "flops_per_solve": None if np.isnan(flops_per_solve)
                else round(flops_per_solve),
                "est_mfu_vs_bf16_peak": None if np.isnan(achieved_flops)
                else round(achieved_flops / V5E_BF16_PEAK, 5),
                "est_util_vs_vpu_f32_peak": None if np.isnan(achieved_flops)
                else round(achieved_flops / V5E_VPU_F32_PEAK, 4),
                "hbm_gbps_analytic": round(hbm_gbps, 1),
                "pct_of_hbm_roofline": round(
                    100.0 * solves_per_s / roofline_solves, 2),
                "config": {"batch": batch, "horizon": horizon,
                           "qp_iters": qp_iters, "reps": reps,
                           "dtype": "float32",
                           "backend": jax.default_backend()},
                "free_base_scenario_mpc": free_base,
                "floating_arm_scenario_mpc": float_arm,
                "long_horizon_h128": h128,
            }
        )
    )


if __name__ == "__main__":
    main()

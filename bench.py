#!/usr/bin/env python
"""Headline benchmark: MPC solves/s/chip on the 6-DoF CRS-A465-style KTE arm,
horizon H=50 (BASELINE.json north star; target ≥ 5000 solves/s/chip).

One "solve" = the full per-scenario pipeline on device:
  nonlinear KTE rollout (50 RK4 steps) → LTV jacfwd linearization →
  condensation (prediction matrices) → box-constrained QP (Mehrotra PDIP).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from reak_tpu.kte import models
    from reak_tpu.ctrl import mpc, systems

    horizon = int(os.environ.get("BENCH_HORIZON", 50))
    batch = int(os.environ.get("BENCH_BATCH", 4096))
    qp_iters = int(os.environ.get("BENCH_QP_ITERS", 8))
    reps = int(os.environ.get("BENCH_REPS", 5))
    dt = 0.01

    spec = models.manip_3r3r()
    f = systems.kte_continuous(spec)
    F = systems.rk4_discrete(f, dt)

    n, m = 12, 6
    prob = mpc.MPCProblem(
        Q=jnp.diag(jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])),
        R=jnp.eye(m) * 0.05,
        QN=jnp.diag(jnp.concatenate([jnp.full(6, 50.0), jnp.full(6, 5.0)])),
        u_min=jnp.full(m, -40.0),
        u_max=jnp.full(m, 40.0),
        horizon=horizon,
    )

    lin = systems.kte_ltv_linearizer(spec, dt)

    method = os.environ.get("BENCH_METHOD", "riccati")

    def solve_one(x0):
        sol = mpc.solve(
            F, prob, x0, qp_iters=qp_iters, sqp_iters=1, constrained=True,
            linearizer=lin, method=method,
        )
        return sol.u[0], jnp.sum(sol.u * sol.u)

    solve_batch = jax.jit(jax.vmap(solve_one))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.5, 0.5, (batch, 6)), rng.uniform(-0.2, 0.2, (batch, 6))],
            axis=1,
        ),
        dtype=jnp.float32,
    )

    # warmup / compile
    u0, c = solve_batch(x0)
    jax.block_until_ready((u0, c))

    t0 = time.perf_counter()
    for _ in range(reps):
        u0, c = solve_batch(x0)
    jax.block_until_ready((u0, c))
    dt_total = time.perf_counter() - t0

    solves_per_s = batch * reps / dt_total
    target = 5000.0
    print(
        json.dumps(
            {
                "metric": "mpc_solves_per_s_per_chip_6dof_H50",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: MPC solves/s/chip on the 6-DoF CRS-A465-style KTE arm,
horizon H=50 (BASELINE.json north star; target ≥ 5000 solves/s/chip).

One "solve" = the full per-scenario pipeline on device:
  fused nonlinear KTE rollout + LTV linearization (batch-in-lanes SoA core)
  → Riccati-recursion interior-point box-QP (Mehrotra, 8 iterations).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: cold SoA-rollout compiles take minutes on the
# tunneled TPU; warm runs hit the cache
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    from reak_tpu.kte import models
    from reak_tpu.ctrl import mpc

    horizon = int(os.environ.get("BENCH_HORIZON", 50))
    batch = int(os.environ.get("BENCH_BATCH", 1024))
    qp_iters = int(os.environ.get("BENCH_QP_ITERS", 8))
    reps = int(os.environ.get("BENCH_REPS", 5))
    dt = 0.01

    spec = models.manip_3r3r()
    m = 6
    prob = mpc.MPCProblem(
        Q=jnp.diag(jnp.concatenate([jnp.full(6, 10.0), jnp.full(6, 1.0)])),
        R=jnp.eye(m) * 0.05,
        QN=jnp.diag(jnp.concatenate([jnp.full(6, 50.0), jnp.full(6, 5.0)])),
        u_min=jnp.full(m, -40.0),
        u_max=jnp.full(m, 40.0),
        horizon=horizon,
    )

    solver = mpc.make_kte_mpc(spec, prob, dt, qp_iters=qp_iters, sqp_iters=1)
    # reduce outputs to a scalar so timing forces full execution through the
    # device tunnel (block_until_ready alone under-syncs on relayed backends)
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

    # warmup / compile
    s = float(step(x0, u0))
    assert np.isfinite(s)

    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(step(x0, u0))
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

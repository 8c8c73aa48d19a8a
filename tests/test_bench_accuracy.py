"""Bench honesty check (VERDICT r1 weak #9): the 8-iteration PDIP setting that
bench.py times must produce control sequences within tolerance of fully
converged (30-iteration) solves on the bench's own x0 distribution — so the
headline solves/s number measures *converged* solves."""
import jax.numpy as jnp
import numpy as np
import pytest

from test_mpc_parity import (_flagship_ltv_batch, FLAGSHIP_Q, FLAGSHIP_QN,
                             FLAGSHIP_R)


@pytest.mark.slow
def test_bench_qp_iters_converged():
    import jax
    from reak_tpu.ctrl.riccati import solve_box_mpc_riccati

    A, B, c, x0 = _flagship_ltv_batch()
    lb = jnp.full(6, -40.0)  # bench.py bounds
    ub = jnp.full(6, 40.0)

    def solve(iters):
        return jax.vmap(
            lambda a, b, cc, x: solve_box_mpc_riccati(
                a, b, cc, jnp.asarray(FLAGSHIP_Q), jnp.asarray(FLAGSHIP_QN),
                jnp.asarray(FLAGSHIP_R), x, lb, ub, iters=iters)[0]
        )(jnp.asarray(A), jnp.asarray(B), jnp.asarray(c), jnp.asarray(x0))

    u8 = np.asarray(solve(8))
    u30 = np.asarray(solve(30))
    err = np.abs(u8 - u30).max()
    assert err <= 1e-3, f"8-iter bench solves not converged: {err:.2e} > 1e-3"

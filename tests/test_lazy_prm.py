"""Lazy / pruned / branch-and-bound connectors (ref: lazy_connector.hpp,
pruned_connector.hpp, branch_and_bound_connector.hpp)."""
import jax.numpy as jnp
import numpy as np

from reak_tpu import planning as pl
from reak_tpu import spaces as sp
from reak_tpu.planning.queries import PlanningQuery
from reak_tpu.planning.lazy_prm import lazy_prm_plan, bnb_prune


def _gap_world():
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))

    def is_free(pts):
        x, y = pts[:, 0], pts[:, 1]
        return ~((jnp.abs(x - 5.0) < 0.3) & ((y < 4.5) | (y > 5.5)))

    ws = pl.Workspace(space, is_free, n_checks=24)
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]),
                      goal_tolerance=0.3)
    return ws, q


def test_lazy_prm_solves_with_fraction_of_edge_checks():
    ws, q = _gap_world()
    res = lazy_prm_plan(ws, q, n_samples=300, k_neighbors=8, seed=1)
    assert res.success
    # the whole point: only path-candidate edges get collision-checked
    assert res.stats["edges_checked"] < 0.25 * res.stats["edges_total"], \
        res.stats
    # and the result is genuinely valid
    a, b = jnp.asarray(res.path[:-1]), jnp.asarray(res.path[1:])
    assert bool(jnp.all(ws.edge_free_batch(a, b)))


def test_lazy_prm_matches_plain_prm_quality():
    ws, q = _gap_world()
    res_l = lazy_prm_plan(ws, q, n_samples=300, k_neighbors=8, seed=1)
    res_p = pl.prm_plan(ws, q, n_samples=300, k_neighbors=8, seed=1)
    assert res_l.success and res_p.success
    # same roadmap, same search: lazy must not degrade the solution beyond
    # what its deferred checks can cause (small slack)
    assert res_l.cost <= res_p.cost * 1.15 + 1e-9


def test_bnb_prune_keeps_optimal_corridor():
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))
    verts = jnp.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [9.0, 9.0]])
    costs = jnp.array([0.0, 5.0, 10.0, jnp.inf])
    goal = jnp.array([10.0, 0.0])
    keep = bnb_prune(verts, costs, goal, incumbent_cost=10.5,
                     space=space, count=3)
    np.testing.assert_array_equal(np.asarray(keep),
                                  [True, True, False, False])

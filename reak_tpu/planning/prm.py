"""Probabilistic roadmap with fully-batched construction.

(ref: ctrl/graph_alg/probabilistic_roadmap.hpp:309 generate_prm;
façade prm_path_planner.hpp:65)

All sampling, validity filtering, k-NN candidate generation, and edge
collision checks happen in a handful of device batches; only the final
shortest-path search runs on host.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.planning.queries import PlanningQuery, PlanResult
from reak_tpu.planning.graph_search import astar


def prm_plan(
    workspace,
    query: PlanningQuery,
    n_samples: int = 512,
    k_neighbors: int = 8,
    seed: int = 0,
) -> PlanResult:
    space = workspace.space
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(seed)

    # batched sampling + validity (oversample to compensate rejections)
    pts = space.sample(key, (2 * n_samples,))
    free = np.asarray(workspace.is_free_batch(pts))
    pts = np.asarray(pts)[free][:n_samples]
    start = np.asarray(query.start)
    goal = np.asarray(query.goal)
    V = np.concatenate([start[None], goal[None], pts], axis=0)
    n_v = V.shape[0]
    Vj = jnp.asarray(V)

    # k-NN candidate edges from the full distance matrix (one device call)
    dmat = np.array(
        jax.vmap(lambda p: space.distance(jnp.broadcast_to(p, Vj.shape), Vj))(Vj)
    )
    np.fill_diagonal(dmat, np.inf)
    nbr = np.argsort(dmat, axis=1)[:, :k_neighbors]
    ii = np.repeat(np.arange(n_v), k_neighbors)
    jj = nbr.ravel()
    keep = ii < jj  # dedupe undirected pairs
    ii, jj = ii[keep], jj[keep]

    # batched edge collision checks
    ok = np.asarray(workspace.edge_free_batch(Vj[ii], Vj[jj]))
    edges = np.stack([ii[ok], jj[ok]], axis=1)
    costs = dmat[ii[ok], jj[ok]]

    h = lambda v: float(space.distance(Vj[v], Vj[1]))
    path_ids, cost = astar(n_v, edges, costs, 0, 1, heuristic=h)
    wall = time.perf_counter() - t0
    if path_ids is None:
        return PlanResult(False, None, float("inf"), n_v, 1, wall,
                          stats={"edges": len(edges)})
    return PlanResult(True, V[path_ids], cost, n_v, 1, wall,
                      stats={"edges": len(edges)})

"""SBA* — sampling-based A* with density-penalized expansion.

(ref: ctrl/graph_alg/sbastar_search.hpp:854-897 generate_sbastar & variants,
lazy_sbastar.hpp, anytime_sbastar.hpp:485, density_calculators.hpp,
density_plan_visitors.hpp; façade sbastar_path_planner.hpp:74)

The reference expands the best-key vertex (key = g + h, penalized by sampling
density) and draws samples around it.  Here each iteration selects the best
FRONT of vertices and expands all of them with one batched sample/NN/edge
wave; density is a batched kernel-density estimate over the vertex set.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.planning.queries import PlanningQuery, PlanResult, path_cost


def sbastar_plan(
    workspace,
    query: PlanningQuery,
    max_iters: int = 60,
    front_size: int = 8,
    samples_per_vertex: int = 8,
    step_size: float = 0.6,
    density_bw: float = 0.3,
    capacity: int = 4096,
    seed: int = 0,
) -> PlanResult:
    space = workspace.space
    start = jnp.asarray(query.start)
    goal = jnp.asarray(query.goal)
    n = start.shape[-1]
    t0 = time.perf_counter()

    verts = np.zeros((capacity, n), np.float64)
    verts[0] = np.asarray(start)
    parents = np.full(capacity, -1, np.int64)
    g = np.full(capacity, np.inf)
    g[0] = 0.0
    expansions = np.zeros(capacity)  # per-vertex expansion count → key penalty
    count = 1
    goal_idx = -1
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def expand_front(front_pts, all_verts, cnt, k):
        # samples around each front vertex (Gaussian local sampling — the
        # reference's sample-near-vertex expansion)
        K = front_pts.shape[0] * samples_per_vertex
        noise = step_size * jax.random.normal(k, (front_pts.shape[0], samples_per_vertex, n))
        cand = space.clamp(front_pts[:, None, :] + noise).reshape(K, n)
        srcs = jnp.repeat(jnp.arange(front_pts.shape[0]), samples_per_vertex)
        ok = workspace.edge_free_batch(front_pts[srcs], cand)
        # density penalty: KDE against existing vertices (batched)
        d2 = jax.vmap(
            lambda p: jnp.sum((all_verts - p) ** 2, axis=-1)
        )(cand)
        mask = jnp.arange(all_verts.shape[0])[None, :] < cnt
        dens = jnp.sum(jnp.where(mask, jnp.exp(-d2 / (2 * density_bw**2)), 0.0), axis=-1)
        return cand, srcs, ok, dens

    accept_per_iter = max(4, front_size * samples_per_vertex // 4)
    for it in range(max_iters):
        # best front by key = g + h, penalized by prior expansions (the SBA*
        # density/constriction key — repeatedly-expanded vertices decay)
        cnt = count
        hv = np.asarray(space.distance(jnp.asarray(verts[:cnt]),
                                       jnp.broadcast_to(goal, (cnt, n))))
        keys = (g[:cnt] + hv) * (1.0 + 0.5 * expansions[:cnt])
        front = np.argsort(keys)[:front_size]
        expansions[front] += 1.0
        key, sub = jax.random.split(key)
        cand, srcs, ok, dens = expand_front(
            jnp.asarray(verts[front]), jnp.asarray(verts), jnp.asarray(cnt), sub
        )
        cand = np.asarray(cand)
        srcs = front[np.asarray(srcs)]
        ok = np.asarray(ok)
        dens = np.asarray(dens)
        # accept a quota of the lowest-density valid candidates
        order = np.argsort(dens)
        taken = 0
        for i in order:
            if taken >= accept_per_iter or count >= capacity - 1:
                break
            if not ok[i]:
                continue
            c_new = g[srcs[i]] + float(
                space.distance(jnp.asarray(verts[srcs[i]]), jnp.asarray(cand[i]))
            )
            verts[count] = cand[i]
            parents[count] = srcs[i]
            g[count] = c_new
            count += 1
            taken += 1
        # lazy goal connection: try direct edges front→goal (batched)
        fg = np.asarray(workspace.edge_free_batch(
            jnp.asarray(verts[front]), jnp.broadcast_to(goal, (len(front), n))
        ))
        dg_front = np.asarray(space.distance(jnp.asarray(verts[front]),
                                             jnp.broadcast_to(goal, (len(front), n))))
        reach = fg & (dg_front <= max(query.goal_tolerance, step_size))
        if reach.any():
            cands = front[reach]
            goal_idx = cands[np.argmin(g[cands] + dg_front[reach])]
            break
        # direct goal test for new vertices
        dg = np.asarray(space.distance(jnp.asarray(verts[:count]),
                                       jnp.broadcast_to(goal, (count, n))))
        hits = np.where(dg <= query.goal_tolerance)[0]
        if len(hits):
            goal_idx = hits[np.argmin(g[hits])]
            break

    wall = time.perf_counter() - t0
    if goal_idx < 0:
        return PlanResult(False, None, float("inf"), count, it + 1, wall)
    path = [np.asarray(goal)]
    i = goal_idx
    while i >= 0:
        path.append(verts[i])
        i = parents[i]
    path = np.stack(path[::-1])
    return PlanResult(True, path, path_cost(space, path), count, it + 1, wall)

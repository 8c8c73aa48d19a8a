"""RRT* with batched expansion, choose-parent, and rewiring.

(ref: ctrl/graph_alg/rrt_star.hpp:530 generate_rrt_star, star-neighborhood
sizing neighborhood_functors.hpp:57; façade rrtstar_path_planner.hpp:65)

Each iteration expands a wave of K samples; for every accepted vertex the
choose-parent and rewire passes evaluate ALL candidate neighbors as one masked
matrix on device (radius from the standard γ(log N / N)^{1/d} shrinking-ball).
"""
from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.math import sorting
from reak_tpu.planning.queries import PlanningQuery, PlanResult, path_cost
from reak_tpu.planning.rrt import _masked_nn


class _StarState(NamedTuple):
    verts: jax.Array  # (cap, n)
    parents: jax.Array  # (cap,)
    costs: jax.Array  # (cap,) cost-to-come
    count: jax.Array  # ()


def _make_star_step(space, workspace, step_size, gamma, goal_bias, K=32,
                    sampler=None):
    """``sampler(state, goal, key) → (K, n)`` overrides the default
    uniform+goal-bias draw — the hook the SBA*-RRT* hybrid uses to mix
    density-guided local samples into the RRT* wave
    (planning/sbastar_rrtstar.py)."""
    dist_fn = space.distance

    def step(state: _StarState, goal, key):
        cap, n = state.verts.shape
        k1, _ = jax.random.split(key)
        if sampler is not None:
            samples = sampler(state, goal, k1)
        else:
            samples = space.sample(k1, (K,))
            n_bias = max(1, int(K * goal_bias))
            samples = samples.at[:n_bias].set(goal)

        near_idx = _masked_nn(state.verts, state.count, samples, dist_fn)
        near = state.verts[near_idx]
        d = dist_fn(near, samples)
        t = jnp.minimum(1.0, step_size / jnp.maximum(d, 1e-12))
        new_pts = space.interpolate(near, samples, t)
        ok = workspace.edge_free_batch(near, new_pts) & (d > 1e-9)

        # shrinking-ball radius (rrt_star.hpp star_neighborhood)
        N = jnp.maximum(state.count.astype(jnp.float32), 2.0)
        dim = float(n)
        radius = jnp.minimum(
            step_size * 2.0, gamma * (jnp.log(N) / N) ** (1.0 / dim)
        )

        # choose parent: masked distances from each new point to all vertices
        dmat = jax.vmap(
            lambda p: dist_fn(jnp.broadcast_to(p, state.verts.shape), state.verts)
        )(new_pts)  # (K, cap)
        vmask = jnp.arange(cap)[None, :] < state.count
        in_ball = vmask & (dmat <= radius)
        # the steering parent is always a candidate (the ball may shrink
        # below step_size; without this the expansion starves)
        in_ball = in_ball | (jnp.arange(cap)[None, :] == near_idx[:, None])
        # edge feasibility for in-ball candidates: (K, cap) edge checks would
        # be cap-heavy — restrict to the M best candidates per new point
        M = 8
        cand_cost = jnp.where(in_ball, state.costs[None, :] + dmat, jnp.inf)
        top_cost, top_idx = sorting.smallest_k(cand_cost, M)  # (K, M) each
        # batch edge checks: (K*M,) pairs
        cand_pts = state.verts[top_idx]  # (K, M, n)
        edge_ok = workspace.edge_free_batch(
            cand_pts.reshape(-1, n), jnp.repeat(new_pts, M, axis=0)
        ).reshape(K, M)
        top_cost = jnp.where(edge_ok, top_cost, jnp.inf)
        best = jnp.argmin(top_cost, axis=-1)  # (K,)
        parent_idx = jnp.take_along_axis(top_idx, best[:, None], axis=-1)[:, 0]
        parent_cost = jnp.take_along_axis(top_cost, best[:, None], axis=-1)[:, 0]
        ok = ok & jnp.isfinite(parent_cost)

        # insert accepted
        offs = jnp.cumsum(ok.astype(jnp.int32)) - 1
        slots = jnp.where(ok, state.count + offs, cap - 1)
        fits = slots < (cap - 1)
        write = ok & fits
        verts = state.verts.at[slots].set(jnp.where(write[:, None], new_pts, state.verts[slots]))
        parents = state.parents.at[slots].set(
            jnp.where(write, parent_idx.astype(jnp.int32), state.parents[slots])
        )
        costs = state.costs.at[slots].set(jnp.where(write, parent_cost, state.costs[slots]))
        count = jnp.minimum(state.count + jnp.sum(write.astype(jnp.int32)),
                            cap - 1).astype(jnp.int32)

        # rewire: for each new vertex, improve in-ball old vertices through it
        thru_cost = parent_cost[:, None] + dmat  # (K, cap)
        improve = write[:, None] & in_ball & (thru_cost < state.costs[None, :] - 1e-9)
        # check improving edges (restrict to best improvement per old vertex)
        gain = jnp.where(improve, state.costs[None, :] - thru_cost, -jnp.inf)
        best_new = jnp.argmax(gain, axis=0)  # (cap,) which new vertex helps most
        best_gain = jnp.max(gain, axis=0)
        rewire_mask = jnp.isfinite(best_gain) & (best_gain > 0)
        old_pts = state.verts
        new_parents_pts = new_pts[best_new]
        edge_ok2 = workspace.edge_free_batch(new_parents_pts, old_pts) & rewire_mask
        new_cost = jnp.where(
            edge_ok2,
            parent_cost[best_new] + dmat[best_new, jnp.arange(cap)],
            costs,
        )
        new_par = jnp.where(edge_ok2, slots[best_new].astype(jnp.int32), parents)
        costs = jnp.where(edge_ok2, new_cost, costs)
        parents = new_par
        return _StarState(verts, parents, costs, count)

    return step


def rrt_star_plan(
    workspace,
    query: PlanningQuery,
    max_iters: int = 150,
    step_size: float = 0.5,
    gamma: float = 3.0,
    goal_bias: float = 0.05,
    capacity: int = 4096,
    seed: int = 0,
) -> PlanResult:
    space = workspace.space
    start = jnp.asarray(query.start)
    goal = jnp.asarray(query.goal)
    n = start.shape[-1]

    state = _StarState(
        verts=jnp.zeros((capacity, n), start.dtype).at[0].set(start),
        parents=jnp.full((capacity,), -1, jnp.int32),
        costs=jnp.full((capacity,), jnp.inf).at[0].set(0.0),
        count=jnp.asarray(1, jnp.int32),
    )
    step = jax.jit(_make_star_step(space, workspace, step_size, gamma, goal_bias))
    key = jax.random.PRNGKey(seed)
    t0 = time.perf_counter()
    for it in range(max_iters):
        key, sub = jax.random.split(key)
        state = step(state, goal, sub)

    # best goal connection
    verts = np.asarray(state.verts)
    costs = np.asarray(state.costs)
    parents = np.asarray(state.parents)
    cnt = int(state.count)
    d_goal = np.asarray(space.distance(jnp.asarray(verts[:cnt]),
                                       jnp.broadcast_to(goal, (cnt, n))))
    near_goal = d_goal <= query.goal_tolerance
    wall = time.perf_counter() - t0
    if not near_goal.any():
        return PlanResult(False, None, float("inf"), cnt, max_iters, wall)
    cand = np.where(near_goal)[0]
    gi = cand[np.argmin(costs[cand] + d_goal[cand])]
    path = [np.asarray(goal)]
    i = gi
    while i >= 0:
        path.append(verts[i])
        i = parents[i]
    path = np.stack(path[::-1])
    return PlanResult(True, path, path_cost(space, path), cnt, max_iters, wall)


def rrt_star_plan_batch(
    workspace,
    query: PlanningQuery,
    n_runs: int = 8,
    max_iters: int = 150,
    step_size: float = 0.5,
    gamma: float = 3.0,
    goal_bias: float = 0.05,
    capacity: int = 4096,
    seed: int = 0,
):
    """Batched Monte-Carlo RRT*: all runs advance as one device program
    (``fori_loop`` over waves, vmapped across runs) — replaces the serial
    MC loop of ref planner_exec_engines.hpp:125-160 like
    rrt.rrt_plan_batch.  Returns ``(results, wall_s_total)``."""
    space = workspace.space
    start = jnp.asarray(query.start)
    goal = jnp.asarray(query.goal)
    n = start.shape[-1]
    step = _make_star_step(space, workspace, step_size, gamma, goal_bias)

    def init_one(_):
        return _StarState(
            verts=jnp.zeros((capacity, n), start.dtype).at[0].set(start),
            parents=jnp.full((capacity,), -1, jnp.int32),
            costs=jnp.full((capacity,), jnp.inf).at[0].set(0.0),
            count=jnp.asarray(1, jnp.int32),
        )

    @jax.jit
    def solve_all(key):
        states = jax.vmap(init_one)(jnp.arange(n_runs))

        def body(it, c):
            states, key = c
            key, sub = jax.random.split(key)
            subs = jax.random.split(sub, n_runs)
            states = jax.vmap(step, in_axes=(0, None, 0))(states, goal, subs)
            return states, key

        states, _ = jax.lax.fori_loop(0, max_iters, body, (states, key))
        return states

    t0 = time.perf_counter()
    states = solve_all(jax.random.PRNGKey(seed))
    jax.block_until_ready(states.verts)
    wall = time.perf_counter() - t0

    results = []
    verts_all = np.asarray(states.verts)
    costs_all = np.asarray(states.costs)
    parents_all = np.asarray(states.parents)
    for r in range(n_runs):
        verts = verts_all[r]
        costs = costs_all[r]
        parents = parents_all[r]
        cnt = int(states.count[r])
        d_goal = np.asarray(space.distance(
            jnp.asarray(verts[:cnt]), jnp.broadcast_to(goal, (cnt, n))))
        near_goal = d_goal <= query.goal_tolerance
        graph = {"verts": verts[:cnt], "parents": parents[:cnt]}
        if not near_goal.any():
            results.append(PlanResult(False, None, float("inf"), cnt,
                                      max_iters, wall / n_runs, stats=graph))
            continue
        cand = np.where(near_goal)[0]
        gi = cand[np.argmin(costs[cand] + d_goal[cand])]
        path = [np.asarray(goal)]
        i = gi
        while i >= 0:
            path.append(verts[i])
            i = parents[i]
        path = np.stack(path[::-1])
        results.append(PlanResult(True, path, path_cost(space, path), cnt,
                                  max_iters, wall / n_runs, stats=graph))
    return results, wall

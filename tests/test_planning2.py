"""AD*, FADPRM, RRG, DVP-tree, intercept query.

Fixture style mirrors tests/test_geom_planning.py (gap world; the reference's
bitmap test-world strategy, SURVEY.md §4)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

import reak_tpu.planning as pl
import reak_tpu.spaces.vector as sp
from reak_tpu.planning.queries import PlanningQuery


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


def _valid_path(ws, path):
    a = jnp.asarray(path[:-1])
    b = jnp.asarray(path[1:])
    return bool(jnp.all(ws.edge_free_batch(a, b)))


# ---------------------------------------------------------------------------
# AD*
# ---------------------------------------------------------------------------


def _grid_graph(W=8, H=8, blocked=()):
    """4-connected grid; returns (n, edges, costs, idx fn)."""
    idx = lambda x, y: y * W + x
    edges, costs = [], []
    for y in range(H):
        for x in range(W):
            if x + 1 < W:
                edges.append((idx(x, y), idx(x + 1, y)))
            if y + 1 < H:
                edges.append((idx(x, y), idx(x, y + 1)))
    costs = [np.inf if e in blocked or (e[1], e[0]) in blocked else 1.0
             for e in edges]
    return W * H, np.asarray(edges), np.asarray(costs, float), idx


class TestADStar:
    def test_matches_astar_at_eps1(self):
        n, edges, costs, idx = _grid_graph()
        from reak_tpu.planning.graph_search import astar
        p0, c0 = astar(n, edges, costs, idx(0, 0), idx(7, 7))
        s = pl.ADStar(n, edges, costs, idx(0, 0), idx(7, 7))
        p1, c1 = s.compute(eps=1.0)
        assert c1 == c0 == 14.0

    def test_anytime_improves(self):
        n, edges, costs, idx = _grid_graph()
        h = lambda v: abs(v % 8 - 7) + abs(v // 8 - 7)
        s = pl.ADStar(n, edges, costs, idx(0, 0), idx(7, 7), heuristic=h)
        p_fast, c_fast = s.compute(eps=3.0)
        p_opt, c_opt = s.compute(eps=1.0)
        assert c_opt <= c_fast
        assert c_opt == 14.0

    def test_incremental_repair_after_edge_block(self):
        n, edges, costs, idx = _grid_graph()
        h = lambda v: abs(v % 8 - 7) + abs(v // 8 - 7)
        s = pl.ADStar(n, edges, costs, idx(0, 0), idx(7, 7), heuristic=h)
        path, cost = s.compute(eps=1.0)
        assert cost == 14.0
        # wall off column x=4 except y=7 → detour required
        blocked = []
        for ei, (u, v) in enumerate(edges):
            ux, uy, vx, vy = u % 8, u // 8, v % 8, v // 8
            if {ux, vx} == {3, 4} and uy == vy and uy < 7:
                blocked.append(ei)
        s.update_edges(blocked, np.inf)
        path2, cost2 = s.compute(eps=1.0)
        assert cost2 == 14.0  # grid detour via y=7 is same manhattan length
        xs = [v % 8 for v in path2]
        ys = [v // 8 for v in path2]
        # crossing x=3→4 must happen at y=7
        for i in range(len(path2) - 1):
            if {xs[i], xs[i + 1]} == {3, 4}:
                assert ys[i] == 7

    def test_unreachable(self):
        n, edges, costs, idx = _grid_graph()
        # block everything around the goal
        bl = [ei for ei, (u, v) in enumerate(edges)
              if idx(7, 7) in (u, v)]
        costs[bl] = np.inf
        s = pl.ADStar(n, edges, costs, idx(0, 0), idx(7, 7))
        path, cost = s.compute(eps=1.0)
        assert path is None and cost == float("inf")


# ---------------------------------------------------------------------------
# FADPRM
# ---------------------------------------------------------------------------


class TestFADPRM:
    def test_plans_gap_world(self):
        ws, q = _gap_world()
        res = pl.fadprm_plan(ws, q, n_samples=600, waves=4, seed=5)
        assert res.path is not None
        assert _valid_path(ws, res.path)

    def test_dynamic_revalidation(self):
        """Plan, then close the gap; revalidate must invalidate the path."""
        space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))

        def is_free(pts):  # wider gap: y ∈ [4, 6]
            x, y = pts[:, 0], pts[:, 1]
            return ~((jnp.abs(x - 5.0) < 0.3) & ((y < 4.0) | (y > 6.0)))

        ws = pl.Workspace(space, is_free, n_checks=24)
        q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]),
                          goal_tolerance=0.3)
        planner = pl.FADPRMPlanner(ws, q, k_neighbors=10, seed=7)
        for _ in range(5):
            planner.grow(150)
        res = planner.solve(eps=1.0)
        assert res.path is not None

        space = ws.space

        def is_free_closed(pts):
            x = pts[:, 0]
            return ~(jnp.abs(x - 5.0) < 0.3)  # full wall now

        ws2 = pl.Workspace(space, is_free_closed, n_checks=24)
        planner.revalidate(ws2)
        res2 = planner.solve(eps=1.0)
        assert res2.path is None  # no way through anymore


# ---------------------------------------------------------------------------
# RRG
# ---------------------------------------------------------------------------


class TestRRG:
    @pytest.mark.slow
    def test_plans_gap_world(self):
        ws, q = _gap_world()
        res = pl.rrg_plan(ws, q, max_iters=120, step_size=0.8, seed=2)
        assert res.path is not None
        assert _valid_path(ws, res.path)
        xs = res.path[:, 0]
        assert float(xs.min()) < 5 < float(xs.max())


# ---------------------------------------------------------------------------
# DVP tree
# ---------------------------------------------------------------------------


class TestDVPTree:
    def test_knn_matches_bruteforce(self, rng):
        pts = rng.standard_normal((500, 4))
        tree = pl.DVPTree(pts, leaf_size=8, seed=1)
        for _ in range(10):
            q = rng.standard_normal(4)
            ti, td = tree.find_nearest(q, k=5)
            bi, bd = pl.linear_nn(q, pts, k=5)
            np.testing.assert_allclose(np.sort(td), np.sort(bd), atol=1e-12)

    def test_range_query(self, rng):
        pts = rng.uniform(0, 1, (300, 2))
        tree = pl.DVPTree(pts, leaf_size=8)
        q = np.array([0.5, 0.5])
        ri, rd = tree.find_in_range(q, 0.2)
        brute = np.linalg.norm(pts - q, axis=1)
        expect = set(np.nonzero(brute <= 0.2)[0].tolist())
        assert set(ri.tolist()) == expect

    def test_custom_metric(self, rng):
        """Weighted metric via a Space's distance function."""
        space = sp.HyperboxSpace(jnp.zeros(2), jnp.ones(2),
                                 weights=jnp.array([10.0, 0.1]))
        pts = rng.uniform(0, 1, (200, 2))
        dist = lambda q, P: space.distance(q, P)
        tree = pl.DVPTree(pts, dist_batch=dist, leaf_size=8)
        q = np.array([0.3, 0.7])
        ti, td = tree.find_nearest(q, k=3)
        bi, bd = pl.linear_nn(q, pts, dist_batch=dist, k=3)
        np.testing.assert_allclose(np.sort(td), np.sort(bd), atol=1e-6)


# ---------------------------------------------------------------------------
# intercept query
# ---------------------------------------------------------------------------


class TestIntercept:
    def test_intercepts_moving_target(self):
        ws, _ = _gap_world()
        # target moves along the far side, passing the gap-ish region
        target = lambda t: np.array([6.0 + 0.3 * t, 5.0])
        q = pl.InterceptQuery(start=jnp.array([1.0, 5.0]), target_traj=target,
                              t_budget=10.0, v_max=2.0, goal_tol=0.4)
        res = pl.intercept_plan(ws, q, max_iters=200, seed=4)
        assert res.path is not None
        ts = np.asarray(res.path[:, 0])
        qs = np.asarray(res.path[:, 1:])
        # time strictly increases and speed limit respected
        assert np.all(np.diff(ts) > 0)
        speeds = np.linalg.norm(np.diff(qs, axis=0), axis=1) / np.diff(ts)
        assert np.all(speeds <= q.v_max + 1e-6)
        # interception: final point near target at final time
        tf = float(ts[-1])
        assert np.linalg.norm(qs[-1] - target(tf)) < 0.8
        assert tf <= q.t_budget

    def test_infeasible_budget(self):
        ws, _ = _gap_world()
        target = lambda t: np.array([9.5, 9.5])
        q = pl.InterceptQuery(start=jnp.array([0.5, 0.5]), target_traj=target,
                              t_budget=0.5, v_max=1.0, goal_tol=0.2)
        res = pl.intercept_plan(ws, q, max_iters=60, seed=4)
        assert res.path is None

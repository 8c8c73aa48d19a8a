"""vlist / differ-report planner execution engines (planning/engines.py) —
motion-graph dumps + run-to-run diff reporting
(ref: planner_exec_engines.hpp:214 vlist_print_mp_engine,
:275 differ_report_mp_engine)."""
import numpy as np
import jax.numpy as jnp

import reak_tpu.planning as pl
import reak_tpu.spaces.vector as sp
from reak_tpu.planning.queries import PlanningQuery
from reak_tpu.planning.rrt import rrt_plan
from reak_tpu.planning.engines import (vlist_engine, differ_report_engine,
                                       load_vlist, diff_motion_graphs)


def _world():
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))

    def is_free(pts):
        x, y = pts[:, 0], pts[:, 1]
        wall = (jnp.abs(x - 5.0) < 0.3) & ((y < 4.5) | (y > 5.5))
        return ~wall

    ws = pl.Workspace(space, is_free, n_checks=24)
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]),
                      goal_tolerance=0.3)
    return ws, q


def test_vlist_engine_dumps_motion_graph(tmp_path):
    ws, q = _world()
    stem = str(tmp_path / "rrt_run")
    res = vlist_engine(rrt_plan, ws, q, stem, seed=3, max_iters=300,
                       step_size=0.7)
    assert res.success
    verts, parents, cost = load_vlist(stem + "_vlist.csv")
    assert len(verts) == res.n_vertices
    # tree structure: root has parent −1 and zero cost; all other parents
    # are valid earlier indices; cost-to-come grows along edges
    assert parents[0] == -1 and cost[0] == 0.0
    assert np.all(parents[1:] >= 0) and np.all(parents[1:] < np.arange(1, len(verts)))
    assert np.all(cost[1:] > 0)
    np.testing.assert_allclose(verts[0], q.start, atol=1e-12)
    # solution records present and start/end correct
    sol = np.loadtxt(stem + "_solutions.csv", delimiter=",", ndmin=2)
    np.testing.assert_allclose(sol[0], q.start, atol=1e-12)
    assert np.linalg.norm(sol[-1] - q.goal) < 1e-9
    times = open(stem + "_times.txt").read().split()
    assert float(times[0]) >= 0 and int(times[1]) == res.n_vertices


def test_differ_engine_densifies_solution(tmp_path):
    ws, q = _world()
    stem = str(tmp_path / "rrt_run")
    res = differ_report_engine(rrt_plan, ws, q, stem, segment_steps=7,
                               seed=3, max_iters=300, step_size=0.7)
    assert res.success
    traj = np.loadtxt(stem + "_traj.csv", delimiter=",", ndmin=2)
    # 7 points per edge + final point
    assert len(traj) == 7 * (len(res.path) - 1) + 1
    np.testing.assert_allclose(traj[0], q.start, atol=1e-12)
    # consecutive interpolants are close (densification actually happened)
    assert np.max(np.linalg.norm(np.diff(traj, axis=0), axis=1)) \
        <= 0.7 / 7 + 1e-6


def test_diff_motion_graphs_reports_run_to_run_delta(tmp_path):
    ws, q = _world()
    stem_a = str(tmp_path / "runA")
    stem_b = str(tmp_path / "runB")
    vlist_engine(rrt_plan, ws, q, stem_a, seed=3, max_iters=300,
                 step_size=0.7)
    vlist_engine(rrt_plan, ws, q, stem_b, seed=11, max_iters=300,
                 step_size=0.7)
    d = diff_motion_graphs(ws.space, stem_a, stem_b)
    assert d["n_vertices"][0] > 10 and d["n_vertices"][1] > 10
    # different seeds → genuinely different graphs, but same world → bounded
    assert 0.0 < d["mean_nn"] < 2.0
    assert d["hausdorff_ab"] < 10.0 and d["hausdorff_ba"] < 10.0
    # identical dumps diff to zero
    d_same = diff_motion_graphs(ws.space, stem_a, stem_a)
    assert d_same["mean_nn"] == 0.0 and d_same["hausdorff_ab"] == 0.0

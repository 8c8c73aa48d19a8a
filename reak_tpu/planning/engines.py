"""Planner execution engines: Monte-Carlo benchmarking + reporters.

(ref: ctrl/path_planning/planner_exec_engines.hpp:86 monte_carlo_mp_engine,
:214 vlist_print_mp_engine, :324 execute_p2p_planner;
basic_sbmp_reporters.hpp:318 timing_sbmp_report, :410 print_sbmp_progress)
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np

from reak_tpu.planning.queries import PlanningQuery, PlanResult


def monte_carlo_engine(planner: Callable, workspace, query: PlanningQuery,
                       n_runs: int = 10, recorder=None, **planner_kw):
    """Repeated randomized runs collecting timing/cost statistics
    (ref: planner_exec_engines.hpp:125-160 — the *_times.txt records).

    Returns dict of aggregate stats; per-run rows go to ``recorder`` (any
    object with a ``record(dict)`` method, e.g. io.recorder sinks).
    """
    rows = []
    for run in range(n_runs):
        res: PlanResult = planner(workspace, query, seed=run, **planner_kw)
        row = {
            "run": run,
            "success": int(res.success),
            "cost": res.cost,
            "vertices": res.n_vertices,
            "iterations": res.n_iterations,
            "wall_time_s": res.wall_time_s,
        }
        rows.append(row)
        if recorder is not None:
            recorder.record(row)
    succ = [r for r in rows if r["success"]]
    return {
        "n_runs": n_runs,
        "success_rate": len(succ) / n_runs,
        "mean_time_s": float(np.mean([r["wall_time_s"] for r in rows])),
        "mean_cost": float(np.mean([r["cost"] for r in succ])) if succ else float("inf"),
        "mean_vertices": float(np.mean([r["vertices"] for r in rows])),
        "rows": rows,
    }


class timing_reporter:
    """Per-iteration wall-clock reporter (ref: timing_sbmp_report,
    basic_sbmp_reporters.hpp:318)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.times = []

    def __call__(self, iteration, state):
        self.times.append((iteration, time.perf_counter() - self.t0))


class progress_reporter:
    """Prints progress every ``interval`` iterations (ref: print_sbmp_progress,
    basic_sbmp_reporters.hpp:410)."""

    def __init__(self, interval: int = 10):
        self.interval = interval

    def __call__(self, iteration, state):
        if iteration % self.interval == 0:
            count = int(state.count) if hasattr(state, "count") else -1
            print(f"[planner] iter={iteration} vertices={count}")

"""Planning queries & results.

(ref: ctrl/path_planning/planning_queries.hpp:66 planning_query,
p2p_planning_query.hpp:74, intercept_query.hpp:75 motion_plan_intercept_query)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np


@dataclass
class PlanningQuery:
    """Point-to-point query; ``goal_fn`` generalizes to moving-target
    interception (goal = any point within tolerance of goal_fn(t),
    ref: intercept_query.hpp:75)."""

    start: np.ndarray
    goal: np.ndarray
    goal_tolerance: float = 1e-2
    goal_fn: Optional[Callable] = None  # t → goal point (interception)
    time_budget: Optional[float] = None


@dataclass
class PlanResult:
    """(ref: planning_queries solution records + seq_path factories,
    solution_path_factories.hpp)"""

    success: bool
    path: Optional[np.ndarray]  # (L, n) waypoints incl. start/goal
    cost: float
    n_vertices: int
    n_iterations: int
    wall_time_s: float
    stats: dict = field(default_factory=dict)


def path_cost(space, path) -> float:
    """Total metric length of a waypoint path."""
    if path is None or len(path) < 2:
        return float("inf")
    import jax.numpy as jnp

    a = jnp.asarray(path[:-1])
    b = jnp.asarray(path[1:])
    return float(jnp.sum(space.distance(a, b)))

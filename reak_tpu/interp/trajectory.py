"""Trajectory containers: waypoint sequences with batched time lookup.

(ref: ctrl/interpolation/waypoint_container.hpp, interpolated_trajectory.hpp,
trajectory_base.hpp, constant_trajectory.hpp, point_to_point_path.hpp,
transformed_trajectory.hpp)

A Trajectory is a value object: ``eval(t)`` broadcasts over arbitrary t
batches using ``searchsorted`` + the chosen interpolator — the pointer-chasing
waypoint iterators of the reference become one gather.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from reak_tpu.interp.hermite import linear_interp, cubic_hermite_interp, quintic_hermite_interp


class Trajectory(NamedTuple):
    """Waypoint trajectory.  times: (K,); points: (K, n); optional vels/accs
    enable cubic/quintic evaluation (ref: interpolated_trajectory.hpp)."""

    times: jax.Array
    points: jax.Array
    vels: Optional[jax.Array] = None
    accs: Optional[jax.Array] = None

    @property
    def t0(self):
        return self.times[0]

    @property
    def t1(self):
        return self.times[-1]

    def eval(self, t):
        """Position at time(s) t (clamped to the time range)."""
        return self.eval_with_derivatives(t)[0]

    def eval_with_derivatives(self, t):
        """(pos, vel[, acc]) at t; order depends on stored data."""
        t = jnp.asarray(t)
        tc = jnp.clip(t, self.times[0], self.times[-1])
        idx = jnp.clip(jnp.searchsorted(self.times, tc, side="right") - 1, 0,
                       self.times.shape[0] - 2)
        t_a = self.times[idx]
        t_b = self.times[idx + 1]
        dt = t_b - t_a
        s = (tc - t_a) / jnp.maximum(dt, 1e-30)
        p0 = self.points[idx]
        p1 = self.points[idx + 1]
        if self.vels is None:
            pos, vel = linear_interp(p0, p1, s, dt[..., None] if jnp.ndim(dt) else dt)
            return pos, vel
        v0 = self.vels[idx]
        v1 = self.vels[idx + 1]
        dtb = dt[..., None] if jnp.ndim(dt) else dt
        if self.accs is None:
            return cubic_hermite_interp(p0, v0, p1, v1, s, dtb)
        a0 = self.accs[idx]
        a1 = self.accs[idx + 1]
        return quintic_hermite_interp(p0, v0, a0, p1, v1, a1, s, dtb)


def waypoint_trajectory(times, points, vels=None, accs=None) -> Trajectory:
    return Trajectory(jnp.asarray(times), jnp.asarray(points),
                      None if vels is None else jnp.asarray(vels),
                      None if accs is None else jnp.asarray(accs))


def constant_trajectory(point, t0=0.0, t1=jnp.inf):
    """(ref: constant_trajectory.hpp)"""
    p = jnp.asarray(point)
    times = jnp.asarray([t0, 1e30 if t1 == jnp.inf else t1])
    return Trajectory(times=times, points=jnp.stack([p, p]))


def point_to_point_trajectory(p0, p1, t0, t1) -> Trajectory:
    """(ref: point_to_point_path.hpp)"""
    return Trajectory(times=jnp.asarray([t0, t1]), points=jnp.stack([jnp.asarray(p0), jnp.asarray(p1)]))


class transformed_trajectory:
    """View of a trajectory through a point mapping (topology map), e.g. the
    target state-trajectory mapped through target-DK ∘ chaser-IK
    (ref: transformed_trajectory.hpp; used by CRS_planner_dynexec.cpp:180-195)."""

    def __init__(self, base: Trajectory, fn: Callable):
        self.base = base
        self.fn = fn

    def eval(self, t):
        return self.fn(self.base.eval(t))

    @property
    def t0(self):
        return self.base.t0

    @property
    def t1(self):
        return self.base.t1

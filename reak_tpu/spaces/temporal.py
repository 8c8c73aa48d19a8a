"""Temporal space: time × base space (ref: ctrl/topologies/temporal_space.hpp,
time_topology.hpp; reachability metrics reachability_space.hpp:180).

Used by dynamic (moving-obstacle) planning: points are ``(t, p)``; the metric
makes backward-in-time moves infinite (can't steer into the past), matching
the reference's temporal-distance semantics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TemporalPoint(NamedTuple):
    time: jax.Array  # (...)
    point: object  # base-space point


class TemporalSpace:
    def __init__(self, base_space, t_max: float, time_weight: float = 1.0,
                 max_speed: float | None = None):
        self.base = base_space
        self.t_max = float(t_max)
        self.time_weight = time_weight
        # max_speed enables reachability pruning: base distance / max_speed
        # must fit into the time difference (reachability_space.hpp semantics)
        self.max_speed = max_speed

    def sample(self, key, batch=()):
        k1, k2 = jax.random.split(key)
        t = jax.random.uniform(k1, batch, maxval=self.t_max)
        return TemporalPoint(t, self.base.sample(k2, batch))

    def distance(self, a: TemporalPoint, b: TemporalPoint):
        """Directed temporal distance from a to b (inf when b is in a's past
        or unreachable at max_speed)."""
        dt = b.time - a.time
        d = self.base.distance(a.point, b.point)
        cost = jnp.sqrt((self.time_weight * dt) ** 2 + d * d)
        ok = dt > 0
        if self.max_speed is not None:
            ok = ok & (d <= self.max_speed * dt)
        return jnp.where(ok, cost, jnp.inf)

    def interpolate(self, a: TemporalPoint, b: TemporalPoint, t):
        return TemporalPoint(
            a.time + (b.time - a.time) * t,
            self.base.interpolate(a.point, b.point, t),
        )

    def difference(self, a, b):
        return (a.time - b.time, self.base.difference(a.point, b.point))

    def clamp(self, p: TemporalPoint):
        return TemporalPoint(jnp.clip(p.time, 0.0, self.t_max), self.base.clamp(p.point))


class TimePoissonSampler:
    """Poisson-process time sampling for temporal planning
    (ref: ctrl/topologies/time_poisson_topology.hpp): sample times as the
    arrivals of a rate-λ process anchored at a start time, so temporal
    planners draw expansion times with exponential inter-arrival gaps
    instead of uniformly over [0, t_max].
    """

    def __init__(self, rate: float, t_start: float = 0.0,
                 t_max: float | None = None):
        self.rate = float(rate)
        self.t_start = float(t_start)
        self.t_max = t_max

    def sample(self, key, batch=()):
        """One arrival per draw: t_start + Exp(rate)."""
        dt = jax.random.exponential(key, batch) / self.rate
        t = self.t_start + dt
        if self.t_max is not None:
            t = jnp.minimum(t, self.t_max)
        return t

    def sample_arrivals(self, key, n: int, batch=()):
        """First n arrivals of the process: cumulative exponential gaps,
        shape ``batch + (n,)``."""
        gaps = jax.random.exponential(key, batch + (n,)) / self.rate
        t = self.t_start + jnp.cumsum(gaps, axis=-1)
        if self.t_max is not None:
            t = jnp.minimum(t, self.t_max)
        return t


def poisson_temporal_sampler(space: TemporalSpace, rate: float):
    """Wrap a TemporalSpace's sampler to draw times from a Poisson process
    anchored at t=0 (the reference composes time_poisson_topology into its
    temporal spaces the same way, temporal_space.hpp)."""
    tp = TimePoissonSampler(rate, 0.0, space.t_max)

    def sample(key, batch=()):
        k1, k2 = jax.random.split(key)
        return TemporalPoint(tp.sample(k1, batch), space.base.sample(k2, batch))

    return sample

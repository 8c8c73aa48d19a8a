"""Euclidean / bounded vector spaces.

(ref: ctrl/topologies/hyperbox_topology.hpp, hyperball_topology.hpp,
line_topology.hpp, vector_topology.hpp, Ndof_spaces.hpp:138)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class HyperboxSpace:
    """Axis-aligned box with uniform sampling and L2 (optionally weighted)
    metric (ref: hyperbox_topology.hpp)."""

    def __init__(self, lower, upper, weights=None):
        self.lower = jnp.asarray(lower)
        self.upper = jnp.asarray(upper)
        self.weights = None if weights is None else jnp.asarray(weights)

    @property
    def dim(self):
        return self.lower.shape[-1]

    def sample(self, key, batch=()):
        u = jax.random.uniform(key, batch + self.lower.shape, dtype=self.lower.dtype)
        return self.lower + u * (self.upper - self.lower)

    def distance(self, a, b):
        d = a - b
        if self.weights is not None:
            d = d * self.weights
        return jnp.linalg.norm(d, axis=-1)

    def interpolate(self, a, b, t):
        t = jnp.asarray(t)[..., None] if jnp.ndim(t) else t
        return a + (b - a) * t

    def difference(self, a, b):
        return a - b

    def clamp(self, p):
        return jnp.clip(p, self.lower, self.upper)

    def contains(self, p):
        return jnp.all((p >= self.lower) & (p <= self.upper), axis=-1)


class NdofSpace(HyperboxSpace):
    """Joint space of an N-DoF arm: a named hyperbox over joint coordinates
    (ref: Ndof_spaces.hpp:138 Ndof_0th_order_space)."""

    @staticmethod
    def from_chain(spec, lower, upper):
        return NdofSpace(lower, upper)


class LineSpace(HyperboxSpace):
    """1-D segment (ref: line_topology.hpp line_segment_topology)."""

    def __init__(self, lo: float, hi: float):
        super().__init__(jnp.asarray([lo]), jnp.asarray([hi]))


class HyperballSpace:
    """Ball of given radius with uniform interior sampling
    (ref: hyperball_topology.hpp)."""

    def __init__(self, center, radius: float):
        self.center = jnp.asarray(center)
        self.radius = float(radius)

    @property
    def dim(self):
        return self.center.shape[-1]

    def sample(self, key, batch=()):
        k1, k2 = jax.random.split(key)
        n = self.dim
        v = jax.random.normal(k1, batch + (n,), dtype=self.center.dtype)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        r = self.radius * jax.random.uniform(k2, batch, dtype=self.center.dtype) ** (1.0 / n)
        return self.center + v * r[..., None]

    def distance(self, a, b):
        return jnp.linalg.norm(a - b, axis=-1)

    def interpolate(self, a, b, t):
        t = jnp.asarray(t)[..., None] if jnp.ndim(t) else t
        return a + (b - a) * t

    def difference(self, a, b):
        return a - b

    def clamp(self, p):
        d = p - self.center
        r = jnp.linalg.norm(d, axis=-1, keepdims=True)
        scale = jnp.minimum(1.0, self.radius / jnp.maximum(r, 1e-30))
        return self.center + d * scale

"""SE(3) pose space, 0th/1st/2nd order tangent bundles.

(ref: ctrl/topologies/se3_topologies.hpp:186,384 se3_0th/1st/2nd_order_topology,
make_se3_space:213; differentiable_space.hpp:220 for the order stacking)

A 0th-order point is ``(pos (...,3), quat (...,4))``; higher orders append
velocity/acceleration tangent components ``(vel, omega)`` / ``(acc, alpha)``.
Represented as flat tuples so they nest cleanly in ProductSpace/planners.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.math import rotations as rot
from reak_tpu.spaces.so3 import SO3Space
from reak_tpu.spaces.vector import HyperboxSpace


class SE3Point(NamedTuple):
    pos: jax.Array  # (..., 3)
    quat: jax.Array  # (..., 4)


class SE3Space:
    """Position box × SO(3), with relative metric weighting
    (ref: se3_topologies.hpp make_se3_space — position bounds + max speeds)."""

    def __init__(self, pos_lower, pos_upper, rot_weight: float = 1.0):
        self.pos_space = HyperboxSpace(pos_lower, pos_upper)
        self.rot_space = SO3Space()
        self.rot_weight = rot_weight

    def sample(self, key, batch=()):
        k1, k2 = jax.random.split(key)
        return SE3Point(self.pos_space.sample(k1, batch), self.rot_space.sample(k2, batch))

    def distance(self, a: SE3Point, b: SE3Point):
        dp = self.pos_space.distance(a.pos, b.pos)
        dr = self.rot_space.distance(a.quat, b.quat)
        return jnp.sqrt(dp * dp + (self.rot_weight * dr) ** 2)

    def interpolate(self, a: SE3Point, b: SE3Point, t):
        return SE3Point(
            self.pos_space.interpolate(a.pos, b.pos, t),
            rot.qslerp(a.quat, b.quat, t),
        )

    def difference(self, a: SE3Point, b: SE3Point):
        return jnp.concatenate(
            [a.pos - b.pos, self.rot_space.difference(a.quat, b.quat)], axis=-1
        )

    def clamp(self, p: SE3Point):
        return SE3Point(self.pos_space.clamp(p.pos), self.rot_space.clamp(p.quat))

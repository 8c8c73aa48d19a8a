"""SO(3) rotation space (ref: ctrl/topologies/so3_topologies.hpp —
quaternion_topology / rate_limited_quat_space).

Points are unit quaternions (..., 4); metric is the geodesic angle; sampling
is uniform (Shoemake via Gaussian normalization); interpolation is slerp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from reak_tpu.math import rotations as rot


class SO3Space:
    def __init__(self, max_angular_speed: float | None = None):
        # max_angular_speed gives the rate-limited variant a time-metric
        self.max_angular_speed = max_angular_speed

    dim = 4  # ambient; tangent dim is 3

    def sample(self, key, batch=()):
        q = jax.random.normal(key, batch + (4,))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)

    def distance(self, a, b):
        ang = jnp.linalg.norm(rot.q_log(rot.qmul(rot.qconj(a), b)), axis=-1)
        if self.max_angular_speed is not None:
            return ang / self.max_angular_speed
        return ang

    def interpolate(self, a, b, t):
        return rot.qslerp(a, b, t)

    def difference(self, a, b):
        """Tangent (rotation vector) taking b to a."""
        return rot.q_log(rot.qmul(rot.qconj(b), a))

    def clamp(self, p):
        return p / jnp.linalg.norm(p, axis=-1, keepdims=True)

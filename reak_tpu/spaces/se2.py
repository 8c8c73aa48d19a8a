"""SE(2) pose space, 0th/1st/2nd order tangent bundles.

(ref: ctrl/topologies/se2_topologies.hpp:62,85,114 se2_0th/1st/2nd_order_topology
and the rate-limited variants :230,253,282; differentiable_space.hpp:220 for
the order stacking)

A 0th-order point is ``SE2Point(pos (...,2), theta (...))`` with the heading
on the circle (wrap-around metric and shortest-arc interpolation).  Note this
deliberately *upgrades* the reference, which models the angle as a plain
clipped bounded segment (line_topology.hpp:191 line_segment_topology — no
ring metric): a true circle metric avoids the artificial ±π seam.  The
1st-order bundle appends planar velocity ``vel (...,2)`` bounded by a
max-speed disc and angular rate ``omega (...)``; the 2nd order appends
``acc (...,2)`` and ``alpha (...)``.  As in `spaces/se3.py`, rate limits make
each level's metric a seconds-of-travel estimate so the product metric is a
travel-time norm (the reference's rl topologies, se2_topologies.hpp:230).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.spaces.vector import HyperboxSpace, HyperballSpace

_TWO_PI = 2.0 * jnp.pi


def wrap_angle(theta):
    """Wrap to (-pi, pi]."""
    return theta - _TWO_PI * jnp.round(theta / _TWO_PI)


class SE2Point(NamedTuple):
    pos: jax.Array  # (..., 2)
    theta: jax.Array  # (...,) heading


class SE2Point1(NamedTuple):
    pos: jax.Array
    theta: jax.Array
    vel: jax.Array  # (..., 2) planar velocity
    omega: jax.Array  # (...,) angular rate


class SE2Point2(NamedTuple):
    pos: jax.Array
    theta: jax.Array
    vel: jax.Array
    omega: jax.Array
    acc: jax.Array  # (..., 2)
    alpha: jax.Array  # (...,)


class SE2Space:
    """Position box × heading circle with relative rotation weighting
    (ref: se2_topologies.hpp:62 se2_0th_order_topology — hyperbox ×
    line_segment over the angle)."""

    order = 0

    def __init__(self, pos_lower, pos_upper, rot_weight: float = 1.0):
        self.pos_space = HyperboxSpace(pos_lower, pos_upper)
        self.rot_weight = float(rot_weight)

    def sample(self, key, batch=()):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k2, batch, minval=-jnp.pi, maxval=jnp.pi)
        return SE2Point(self.pos_space.sample(k1, batch), theta)

    def _dtheta(self, a, b):
        return wrap_angle(a.theta - b.theta)

    def distance(self, a: SE2Point, b: SE2Point):
        dp = self.pos_space.distance(a.pos, b.pos)
        dr = jnp.abs(self._dtheta(a, b))
        return jnp.sqrt(dp * dp + (self.rot_weight * dr) ** 2)

    def interpolate(self, a: SE2Point, b: SE2Point, t):
        tt = jnp.asarray(t)
        tb = tt[..., None] if jnp.ndim(tt) else tt
        return SE2Point(
            a.pos + (b.pos - a.pos) * tb,
            wrap_angle(a.theta - self._dtheta(a, b) * tt),
        )

    def difference(self, a: SE2Point, b: SE2Point):
        return jnp.concatenate(
            [a.pos - b.pos, self._dtheta(a, b)[..., None]], axis=-1
        )

    def clamp(self, p: SE2Point):
        return SE2Point(self.pos_space.clamp(p.pos), wrap_angle(p.theta))


class SE21stOrderSpace:
    """1st-order SE(2) tangent bundle (ref: se2_topologies.hpp:85
    se2_1st_order_topology): pose level + planar-velocity disc of radius
    max_speed and angular-rate interval ±max_ang_speed.  With rate limits the
    metric is a travel-time norm (se2_topologies.hpp:253 rl variant)."""

    order = 1

    def __init__(
        self,
        pos_lower,
        pos_upper,
        max_speed: float,
        max_ang_speed: float,
        max_acc: float | None = None,
        max_ang_acc: float | None = None,
    ):
        self.pose = SE2Space(pos_lower, pos_upper)
        # clamp divisors so a non-moving/non-rotating axis (max_*_speed=0)
        # yields zero travel time when the coordinates agree, not NaN
        self.max_speed = max(float(max_speed), 1e-12)
        self.max_ang_speed = max(float(max_ang_speed), 1e-12)
        self.inv_acc = 1.0 / max_acc if max_acc else 1.0 / self.max_speed
        self.inv_ang_acc = (
            1.0 / max_ang_acc if max_ang_acc else 1.0 / self.max_ang_speed
        )
        self.vel_space = HyperballSpace(jnp.zeros(2), max_speed)

    def sample(self, key, batch=()):
        k1, k2, k3 = jax.random.split(key, 3)
        pose = self.pose.sample(k1, batch)
        omega = jax.random.uniform(
            k3, batch, minval=-self.max_ang_speed, maxval=self.max_ang_speed
        )
        return SE2Point1(pose.pos, pose.theta, self.vel_space.sample(k2, batch), omega)

    def _level_times(self, a, b):
        dp = jnp.linalg.norm(a.pos - b.pos, axis=-1) / self.max_speed
        dr = jnp.abs(self.pose._dtheta(a, b)) / self.max_ang_speed
        dv = jnp.linalg.norm(a.vel - b.vel, axis=-1) * self.inv_acc
        dw = jnp.abs(a.omega - b.omega) * self.inv_ang_acc
        return dp, dr, dv, dw

    def distance(self, a: SE2Point1, b: SE2Point1):
        dp, dr, dv, dw = self._level_times(a, b)
        return jnp.sqrt(dp * dp + dr * dr + dv * dv + dw * dw)

    def interpolate(self, a: SE2Point1, b: SE2Point1, t):
        pose = self.pose.interpolate(
            SE2Point(a.pos, a.theta), SE2Point(b.pos, b.theta), t
        )
        tt = jnp.asarray(t)
        tb = tt[..., None] if jnp.ndim(tt) else tt
        return SE2Point1(
            pose.pos,
            pose.theta,
            a.vel + (b.vel - a.vel) * tb,
            a.omega + (b.omega - a.omega) * tt,
        )

    def difference(self, a: SE2Point1, b: SE2Point1):
        return jnp.concatenate(
            [
                a.pos - b.pos,
                self.pose._dtheta(a, b)[..., None],
                a.vel - b.vel,
                (a.omega - b.omega)[..., None],
            ],
            axis=-1,
        )

    def clamp(self, p: SE2Point1):
        pose = self.pose.clamp(SE2Point(p.pos, p.theta))
        return SE2Point1(
            pose.pos,
            pose.theta,
            self.vel_space.clamp(p.vel),
            jnp.clip(p.omega, -self.max_ang_speed, self.max_ang_speed),
        )


class SE22ndOrderSpace(SE21stOrderSpace):
    """2nd-order SE(2) tangent bundle (ref: se2_topologies.hpp:114): adds a
    planar-acceleration disc and an angular-acceleration interval."""

    order = 2

    def __init__(
        self,
        pos_lower,
        pos_upper,
        max_speed: float,
        max_ang_speed: float,
        max_acc: float,
        max_ang_acc: float,
        max_jerk: float | None = None,
        max_ang_jerk: float | None = None,
    ):
        super().__init__(
            pos_lower, pos_upper, max_speed, max_ang_speed, max_acc, max_ang_acc
        )
        self.max_acc = float(max_acc)
        self.max_ang_acc = float(max_ang_acc)
        self.inv_jerk = 1.0 / max_jerk if max_jerk else 1.0 / max(max_acc, 1e-12)
        self.inv_ang_jerk = (
            1.0 / max_ang_jerk if max_ang_jerk else 1.0 / max(max_ang_acc, 1e-12)
        )
        self.acc_space = HyperballSpace(jnp.zeros(2), max_acc)

    def sample(self, key, batch=()):
        k1, k2, k3 = jax.random.split(key, 3)
        p1 = super().sample(k1, batch)
        alpha = jax.random.uniform(
            k3, batch, minval=-self.max_ang_acc, maxval=self.max_ang_acc
        )
        return SE2Point2(
            p1.pos, p1.theta, p1.vel, p1.omega, self.acc_space.sample(k2, batch), alpha
        )

    def distance(self, a: SE2Point2, b: SE2Point2):
        dp, dr, dv, dw = self._level_times(a, b)
        da = jnp.linalg.norm(a.acc - b.acc, axis=-1) * self.inv_jerk
        dl = jnp.abs(a.alpha - b.alpha) * self.inv_ang_jerk
        return jnp.sqrt(dp * dp + dr * dr + dv * dv + dw * dw + da * da + dl * dl)

    def interpolate(self, a: SE2Point2, b: SE2Point2, t):
        p1 = super().interpolate(
            SE2Point1(a.pos, a.theta, a.vel, a.omega),
            SE2Point1(b.pos, b.theta, b.vel, b.omega),
            t,
        )
        tt = jnp.asarray(t)
        tb = tt[..., None] if jnp.ndim(tt) else tt
        return SE2Point2(
            p1.pos,
            p1.theta,
            p1.vel,
            p1.omega,
            a.acc + (b.acc - a.acc) * tb,
            a.alpha + (b.alpha - a.alpha) * tt,
        )

    def difference(self, a: SE2Point2, b: SE2Point2):
        d1 = super().difference(
            SE2Point1(a.pos, a.theta, a.vel, a.omega),
            SE2Point1(b.pos, b.theta, b.vel, b.omega),
        )
        return jnp.concatenate(
            [d1, a.acc - b.acc, (a.alpha - b.alpha)[..., None]], axis=-1
        )

    def clamp(self, p: SE2Point2):
        p1 = super().clamp(SE2Point1(p.pos, p.theta, p.vel, p.omega))
        return SE2Point2(
            p1.pos,
            p1.theta,
            p1.vel,
            p1.omega,
            self.acc_space.clamp(p.acc),
            jnp.clip(p.alpha, -self.max_ang_acc, self.max_ang_acc),
        )


class FlatSE2Space:
    """Array-chart SE(2): points are plain ``(..., 3)`` arrays ``[x, y, θ]``
    with the wrap-around heading metric — the representation the array-backed
    planners (`planning/rrt.py` fixed-capacity vertex tables) consume, so a
    mobile-robot pose plans exactly like a joint vector (the reference plans
    SE(2) through the same generic topology concept, se2_topologies.hpp:145 +
    ptrobot2D_test_world.hpp)."""

    order = 0

    def __init__(self, pos_lower, pos_upper, rot_weight: float = 1.0):
        self.pos_space = HyperboxSpace(pos_lower, pos_upper)
        self.rot_weight = float(rot_weight)

    def sample(self, key, batch=()):
        k1, k2 = jax.random.split(key)
        pos = self.pos_space.sample(k1, batch)
        theta = jax.random.uniform(k2, batch + (1,), minval=-jnp.pi, maxval=jnp.pi)
        return jnp.concatenate([pos, theta], axis=-1)

    def distance(self, a, b):
        dp = self.pos_space.distance(a[..., :2], b[..., :2])
        dr = jnp.abs(wrap_angle(a[..., 2] - b[..., 2]))
        return jnp.sqrt(dp * dp + (self.rot_weight * dr) ** 2)

    def interpolate(self, a, b, t):
        tt = jnp.asarray(t)
        tb = tt[..., None] if jnp.ndim(tt) else tt
        pos = a[..., :2] + (b[..., :2] - a[..., :2]) * tb
        dth = wrap_angle(a[..., 2] - b[..., 2])
        theta = wrap_angle(a[..., 2] - dth * tt)
        return jnp.concatenate([pos, theta[..., None]], axis=-1)

    def difference(self, a, b):
        return jnp.concatenate(
            [a[..., :2] - b[..., :2], wrap_angle(a[..., 2] - b[..., 2])[..., None]],
            axis=-1,
        )

    def clamp(self, p):
        return jnp.concatenate(
            [self.pos_space.clamp(p[..., :2]), wrap_angle(p[..., 2])[..., None]],
            axis=-1,
        )


def make_se2_space(pos_lower, pos_upper, order=0, **limits):
    """Order-dispatched SE(2) space factory (ref: se2_topologies.hpp:145
    se2_topology order dispatch)."""
    if order == 0:
        return SE2Space(pos_lower, pos_upper, **limits)
    if order == 1:
        return SE21stOrderSpace(pos_lower, pos_upper, **limits)
    if order == 2:
        return SE22ndOrderSpace(pos_lower, pos_upper, **limits)
    raise ValueError(f"unsupported order {order}")

"""Exact convex-pair distances for the "hard" shape pairs.

TPU-native replacement for the reference's NLP support-function fallback
(ref: geometry/proximity/prox_fundamentals_3D.hpp:57-264
findProximityByGJKEPA / NLP proximity, used for box-box, cylinder-cylinder,
box-cylinder — the pairs with no closed form).

Method: alternating closed-form projections between the two convex sets
(POCS).  Each shape has an exact Euclidean projection operator; iterating
  p ← proj_A(q),  q ← proj_B(p)
converges linearly to a closest-point pair for separated convex sets and to
a common point (distance 0) for intersecting ones.  Fixed iteration count →
jit/vmap-friendly; every step is a handful of fused VPU ops per lane.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.geom.shapes import Box, Capsule, Cylinder, Sphere
from reak_tpu.math import rotations as rot


# ---------------------------------------------------------------------------
# exact point projections (world coords)
# ---------------------------------------------------------------------------


def project_sphere(p, s: Sphere):
    d = p - s.center
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    inside = n[..., 0] <= s.radius
    on_surf = s.center + d / jnp.maximum(n, 1e-12) * s.radius[..., None]
    return jnp.where(inside[..., None], p, on_surf)


def project_box(p, b: Box):
    """Clamp in the box frame (ref: prox box support math, re-derived)."""
    local = rot.qrot_inv(b.quat, p - b.center)
    clamped = jnp.clip(local, -b.half_extents, b.half_extents)
    return b.center + rot.qrot(b.quat, clamped)


def project_capsule(p, c: Capsule):
    ab = c.b - c.a
    t = jnp.sum((p - c.a) * ab, axis=-1) / jnp.maximum(
        jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    q = c.a + t[..., None] * ab
    d = p - q
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    inside = n[..., 0] <= c.radius
    on_surf = q + d / jnp.maximum(n, 1e-12) * c.radius[..., None]
    return jnp.where(inside[..., None], p, on_surf)


def project_cylinder(p, c: Cylinder):
    """Exact flat-capped cylinder projection (the pair the reference can only
    handle via its NLP fallback)."""
    axis = c.b - c.a
    L = jnp.linalg.norm(axis, axis=-1)
    u = axis / jnp.maximum(L, 1e-12)[..., None]
    w = p - c.a
    t = jnp.sum(w * u, axis=-1)                 # axial coordinate ∈ [0, L]
    radial = w - t[..., None] * u
    r = jnp.linalg.norm(radial, axis=-1)
    rdir = radial / jnp.maximum(r, 1e-12)[..., None]

    t_cl = jnp.clip(t, 0.0, L)
    r_cl = jnp.minimum(r, c.radius)
    inside = (t >= 0.0) & (t <= L) & (r <= c.radius)
    # nearest boundary for interior points: side wall vs nearer cap
    d_side = c.radius - r
    d_cap = jnp.minimum(t, L - t)
    side_pt = c.a + t_cl[..., None] * u + rdir * c.radius[..., None]
    cap_t = jnp.where(t < L - t, 0.0, L)
    cap_pt = c.a + cap_t[..., None] * u + rdir * r_cl[..., None]
    interior_proj = jnp.where((d_side < d_cap)[..., None], side_pt, cap_pt)
    exterior_proj = c.a + t_cl[..., None] * u + rdir * r_cl[..., None]
    # NOTE: for *set* projection (closest point of the solid), interior
    # points project to themselves
    return jnp.where(inside[..., None], p, exterior_proj), interior_proj


def _proj_fn(shape) -> Callable:
    if isinstance(shape, Sphere):
        return lambda p: project_sphere(p, shape)
    if isinstance(shape, Box):
        return lambda p: project_box(p, shape)
    if isinstance(shape, Capsule):
        return lambda p: project_capsule(p, shape)
    if isinstance(shape, Cylinder):
        return lambda p: project_cylinder(p, shape)[0]
    raise TypeError(f"no projection for {type(shape).__name__}")


def _center(shape):
    if isinstance(shape, Sphere):
        return shape.center
    if isinstance(shape, Box):
        return shape.center
    if isinstance(shape, (Capsule, Cylinder)):
        return 0.5 * (shape.a + shape.b)
    raise TypeError


class PairResult(NamedTuple):
    """(ref: proximity record proximity_record_3D, proximity_finder_3D.hpp:49)"""

    distance: jax.Array   # ≥ 0; 0 when intersecting
    point_a: jax.Array    # closest point on A
    point_b: jax.Array    # closest point on B


def convex_pair(shape_a, shape_b, iters: int = 60) -> PairResult:
    """Closest points between two convex shapes by alternating projection.

    Works for any combination of Sphere/Capsule/Cylinder/Box (the reference
    needs per-pair analytic kernels plus an NLP fallback; one batched
    fixed-point loop covers them all here).  Shapes broadcast over leading
    axes.  Distance is exact at convergence; with the default 60 iterations
    the residual is far below collision-margin scales for separated pairs.
    """
    pa = _proj_fn(shape_a)
    pb = _proj_fn(shape_b)
    q0 = _center(shape_b)

    def step(carry, _):
        p, q = carry
        p1 = pa(q)
        q1 = pb(p1)
        return (p1, q1), None

    p0 = pa(q0)
    (p, q), _ = jax.lax.scan(step, (p0, pb(p0)), None, length=iters)
    return PairResult(distance=jnp.linalg.norm(p - q, axis=-1),
                      point_a=p, point_b=q)


def dist_box_box(b1: Box, b2: Box, iters: int = 60):
    """(ref: prox_box_box fallback via NLP, prox_fundamentals_3D.hpp:57)"""
    return convex_pair(b1, b2, iters).distance


def dist_cylinder_cylinder(c1: Cylinder, c2: Cylinder, iters: int = 60):
    """(ref: prox_cylinder_cylinder.hpp — exact flat caps, not the capsule
    approximation)"""
    return convex_pair(c1, c2, iters).distance


def dist_cylinder_box(c: Cylinder, b: Box, iters: int = 60):
    """(ref: prox_cylinder_box.hpp)"""
    return convex_pair(c, b, iters).distance

"""Pairwise distance kernels + aggregate proxy-query dispatch, batched.

(ref: geometry/proximity/prox_sphere_sphere.cpp, prox_sphere_box.cpp,
prox_ccylinder_ccylinder.cpp, prox_plane_*.cpp, … — ~20 pair TUs; NLP
fallback for the hard convex pairs prox_fundamentals_3D.hpp:57-264;
aggregate dispatch proxy_query_model.hpp:51-196)

ALL kernels return SIGNED distance (negative = penetration depth).  The
"hard" convex pairs (box-box, cylinder-anything, capsule-box) dispatch to
:func:`reak_tpu.geom.convex.signed_pair`: alternating-projection closest
points when separated, SAT-seeded support-function minimization for the
penetration depth on overlap.  Everything broadcasts over leading batch
axes; ``proxy_query`` evaluates ALL registered pairs of two ProxyModels in
one fused batch — the planner collision inner loop.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from reak_tpu.math import rotations as rot
from reak_tpu.geom.shapes import Sphere, Capsule, Box, Cylinder, Plane, ShapeSet
from reak_tpu.geom.convex import convex_pair, signed_pair


# ---------------------------------------------------------------------------
# point / segment primitives
# ---------------------------------------------------------------------------


def _closest_on_segment(p, a, b):
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-30)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def dist_segment_segment(a0, a1, b0, b1):
    """Min distance between segments (the core of the reference's
    ccylinder-ccylinder kernel, prox_ccylinder_ccylinder.cpp)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-30), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-30)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-30), 0.0, 1.0)
    p1 = a0 + s[..., None] * d1
    p2 = b0 + t_cl[..., None] * d2
    return jnp.linalg.norm(p1 - p2, axis=-1)


def dist_point_box(p, box: Box):
    """Signed distance point↔oriented box (ref: prox_*_box kernels)."""
    local = rot.qrot_inv(box.quat, p - box.center)
    d = jnp.abs(local) - box.half_extents
    outside = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(d, axis=-1), 0.0)
    return outside + inside


# ---------------------------------------------------------------------------
# pair kernels (signed distances)
# ---------------------------------------------------------------------------


def dist_sphere_sphere(s1: Sphere, s2: Sphere):
    """(ref: prox_sphere_sphere.cpp)"""
    return jnp.linalg.norm(s1.center - s2.center, axis=-1) - s1.radius - s2.radius


def dist_sphere_capsule(s: Sphere, c: Capsule):
    """(ref: prox_sphere_ccylinder.cpp)"""
    q = _closest_on_segment(s.center, c.a, c.b)
    return jnp.linalg.norm(s.center - q, axis=-1) - s.radius - c.radius


def dist_sphere_box(s: Sphere, b: Box):
    """(ref: prox_sphere_box.cpp)"""
    return dist_point_box(s.center, b) - s.radius


def dist_sphere_plane(s: Sphere, p: Plane):
    """(ref: prox_plane_sphere.cpp) — signed: below the plane is negative."""
    return jnp.sum(s.center * p.normal, axis=-1) - p.offset - s.radius


def dist_capsule_capsule(c1: Capsule, c2: Capsule):
    """(ref: prox_ccylinder_ccylinder.cpp)"""
    return dist_segment_segment(c1.a, c1.b, c2.a, c2.b) - c1.radius - c2.radius


def dist_capsule_plane(c: Capsule, p: Plane):
    """(ref: prox_plane_ccylinder.cpp)"""
    da = jnp.sum(c.a * p.normal, axis=-1) - p.offset
    db = jnp.sum(c.b * p.normal, axis=-1) - p.offset
    return jnp.minimum(da, db) - c.radius


def dist_capsule_box(c: Capsule, b: Box, iters: int = 60):
    """Exact capsule↔box via the convex solver (the reference's pair needs an
    iterative NLP fallback, prox_fundamentals_3D.hpp:57).  Signed: POCS
    closest points when separated, −penetration depth on overlap."""
    return signed_pair(c, b).distance


def dist_box_plane(b: Box, p: Plane):
    """(ref: prox_plane_box — support point of the box along -n)"""
    R = rot.q_to_matrix(b.quat)
    # projection radius of the box onto the plane normal
    r = jnp.sum(jnp.abs(jnp.einsum("...ij,...i->...j", R, p.normal)) * b.half_extents, axis=-1)
    dc = jnp.sum(b.center * p.normal, axis=-1) - p.offset
    return dc - r


def dist_box_box(b1: Box, b2: Box, iters: int = 60):
    """Signed box↔box: SAT-seeded support minimization on overlap, POCS when
    separated (ref: NLP/EPA fallback, prox_fundamentals_3D.hpp:57-264)."""
    return signed_pair(b1, b2).distance


def dist_point_cylinder(p, c: Cylinder):
    """Signed distance point ↔ solid flat-capped cylinder."""
    axis = c.b - c.a
    L = jnp.linalg.norm(axis, axis=-1)
    u = axis / jnp.maximum(L, 1e-12)[..., None]
    w = p - c.a
    t = jnp.sum(w * u, axis=-1)
    radial = w - t[..., None] * u
    r = jnp.linalg.norm(radial, axis=-1)
    dr = r - c.radius  # >0 outside the side wall
    dt = jnp.maximum(-t, t - L)  # >0 beyond a cap
    outside = jnp.linalg.norm(
        jnp.stack([jnp.maximum(dr, 0.0), jnp.maximum(dt, 0.0)], axis=-1), axis=-1
    )
    inside = jnp.minimum(jnp.maximum(dr, dt), 0.0)
    return outside + inside


def dist_sphere_cylinder(s: Sphere, c: Cylinder):
    """(ref: prox_sphere_cylinder.cpp — exact flat caps)"""
    return dist_point_cylinder(s.center, c) - s.radius


def dist_cylinder_plane(c: Cylinder, p: Plane):
    """Signed distance cylinder ↔ plane: support of the nearer cap rim along
    −n (ref: prox_plane_cylinder.cpp)."""
    axis = c.b - c.a
    L = jnp.linalg.norm(axis, axis=-1)
    u = axis / jnp.maximum(L, 1e-12)[..., None]
    cosn = jnp.sum(u * p.normal, axis=-1)
    rim_drop = c.radius * jnp.sqrt(jnp.maximum(1.0 - cosn * cosn, 0.0))
    da = jnp.sum(c.a * p.normal, axis=-1) - p.offset - rim_drop
    db = jnp.sum(c.b * p.normal, axis=-1) - p.offset - rim_drop
    return jnp.minimum(da, db)


def dist_cylinder_cylinder(c1: Cylinder, c2: Cylinder, iters: int = 60):
    """(ref: prox_cylinder_cylinder — exact flat caps).  Signed."""
    return signed_pair(c1, c2).distance


def dist_cylinder_box(c: Cylinder, b: Box, iters: int = 60):
    """(ref: prox_cylinder_box via NLP fallback).  Signed."""
    return signed_pair(c, b).distance


def dist_cylinder_capsule(c: Cylinder, cap: Capsule, iters: int = 60):
    """Exact cylinder↔capsule via the convex solver.  Signed."""
    return signed_pair(c, cap).distance


# ---------------------------------------------------------------------------
# aggregate proxy-query models
# ---------------------------------------------------------------------------


class ProxyModel(NamedTuple):
    """World-posed shape aggregate (ref: proxy_query_model_3D,
    proxy_query_model.hpp:92)."""

    spheres: Optional[Sphere] = None  # batched (ns, …)
    capsules: Optional[Capsule] = None  # (nc, …)
    boxes: Optional[Box] = None  # (nb, …)
    planes: Optional[Plane] = None  # (np, …)
    cylinders: Optional[Cylinder] = None  # (ncy, …)


def _pairwise(fn, A, B):
    """All-pairs evaluation: A batched (n,…), B batched (m,…) → (n, m)."""
    fa = jax.vmap(lambda a: jax.vmap(lambda b: fn(a, b))(B))
    return fa(A)


def proxy_query(m1: ProxyModel, m2: ProxyModel):
    """Minimum signed distance between two shape aggregates, evaluating every
    registered pair kernel in batch (ref: proxy_query_pair_3D::findMinimumDistance,
    proxy_query_model.hpp:155)."""
    dists = []

    def add(d):
        dists.append(jnp.min(d))

    if m1.spheres is not None and m2.spheres is not None:
        add(_pairwise(dist_sphere_sphere, m1.spheres, m2.spheres))
    if m1.spheres is not None and m2.capsules is not None:
        add(_pairwise(dist_sphere_capsule, m1.spheres, m2.capsules))
    if m1.capsules is not None and m2.spheres is not None:
        add(_pairwise(lambda c, s: dist_sphere_capsule(s, c), m1.capsules, m2.spheres))
    if m1.spheres is not None and m2.boxes is not None:
        add(_pairwise(dist_sphere_box, m1.spheres, m2.boxes))
    if m1.boxes is not None and m2.spheres is not None:
        add(_pairwise(lambda b, s: dist_sphere_box(s, b), m1.boxes, m2.spheres))
    if m1.capsules is not None and m2.capsules is not None:
        add(_pairwise(dist_capsule_capsule, m1.capsules, m2.capsules))
    if m1.capsules is not None and m2.boxes is not None:
        add(_pairwise(dist_capsule_box, m1.capsules, m2.boxes))
    if m1.boxes is not None and m2.capsules is not None:
        add(_pairwise(lambda b, c: dist_capsule_box(c, b), m1.boxes, m2.capsules))
    if m1.boxes is not None and m2.boxes is not None:
        add(_pairwise(dist_box_box, m1.boxes, m2.boxes))
    if m1.spheres is not None and m2.planes is not None:
        add(_pairwise(dist_sphere_plane, m1.spheres, m2.planes))
    if m1.capsules is not None and m2.planes is not None:
        add(_pairwise(dist_capsule_plane, m1.capsules, m2.planes))
    if m1.boxes is not None and m2.planes is not None:
        add(_pairwise(dist_box_plane, m1.boxes, m2.planes))
    # exact flat-capped cylinder pairs (ref handles these via its NLP
    # fallback; here: closed forms + the alternating-projection solver)
    if m1.cylinders is not None and m2.spheres is not None:
        add(_pairwise(lambda c, s: dist_sphere_cylinder(s, c), m1.cylinders, m2.spheres))
    if m1.spheres is not None and m2.cylinders is not None:
        add(_pairwise(dist_sphere_cylinder, m1.spheres, m2.cylinders))
    if m1.cylinders is not None and m2.capsules is not None:
        add(_pairwise(dist_cylinder_capsule, m1.cylinders, m2.capsules))
    if m1.capsules is not None and m2.cylinders is not None:
        add(_pairwise(lambda cp, cy: dist_cylinder_capsule(cy, cp), m1.capsules, m2.cylinders))
    if m1.cylinders is not None and m2.boxes is not None:
        add(_pairwise(dist_cylinder_box, m1.cylinders, m2.boxes))
    if m1.boxes is not None and m2.cylinders is not None:
        add(_pairwise(lambda b, cy: dist_cylinder_box(cy, b), m1.boxes, m2.cylinders))
    if m1.cylinders is not None and m2.cylinders is not None:
        add(_pairwise(dist_cylinder_cylinder, m1.cylinders, m2.cylinders))
    if m1.cylinders is not None and m2.planes is not None:
        add(_pairwise(dist_cylinder_plane, m1.cylinders, m2.planes))
    if not dists:
        return jnp.asarray(jnp.inf)
    return jnp.min(jnp.stack(dists))

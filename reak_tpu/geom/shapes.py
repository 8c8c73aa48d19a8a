"""Shape primitives as array records.

(ref: geometry/shapes/sphere.hpp, box.hpp, cylinder.hpp, capped_cylinder.hpp,
plane.hpp, rectangle.hpp, circle.hpp, composite_shape*.hpp, colored_model.hpp)

Each shape is a NamedTuple of arrays; leading batch axes everywhere, so a
"composite model" is just a batched shape record (the reference's
composite_shape / colored_model lists collapse into stacking).  Cylinder
pairs get EXACT flat-cap distances via the alternating-projection solver in
``geom.convex`` (the reference handles these pairs with an NLP fallback,
prox_fundamentals_3D.hpp:57).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from reak_tpu.math import rotations as rot


class Sphere(NamedTuple):
    """(ref: geometry/shapes/sphere.hpp; circle.hpp in 2D)"""

    center: jax.Array  # (..., 3)
    radius: jax.Array  # (...)


class Capsule(NamedTuple):
    """Segment + radius (ref: capped_cylinder.hpp; capped_rectangle.hpp 2D)."""

    a: jax.Array  # (..., 3) segment start
    b: jax.Array  # (..., 3) segment end
    radius: jax.Array  # (...)


class Cylinder(NamedTuple):
    """(ref: cylinder.hpp) — exact flat-capped cylinder."""

    a: jax.Array
    b: jax.Array
    radius: jax.Array

    @property
    def as_capsule(self) -> Capsule:
        return Capsule(self.a, self.b, self.radius)


class Box(NamedTuple):
    """Oriented box: pose + half extents (ref: box.hpp; rectangle.hpp 2D)."""

    center: jax.Array  # (..., 3)
    quat: jax.Array  # (..., 4) local→world
    half_extents: jax.Array  # (..., 3)


class Plane(NamedTuple):
    """Half-space boundary: unit normal + offset, n·x = d (ref: plane.hpp)."""

    normal: jax.Array  # (..., 3)
    offset: jax.Array  # (...)


class ShapeSet(NamedTuple):
    """Aggregate of same-type shape batches with local poses relative to an
    anchor frame — the chain-anchored geometry of the reference
    (kte_chain_geometry.hpp:52): ``attach``ed to body indices, ``posed``
    through FK results.
    """

    spheres: Optional[Sphere] = None
    capsules: Optional[Capsule] = None
    boxes: Optional[Box] = None
    cylinders: Optional[Cylinder] = None
    sphere_body: Optional[jax.Array] = None  # (ns,) int body index (-1 = world)
    capsule_body: Optional[jax.Array] = None
    box_body: Optional[jax.Array] = None
    cylinder_body: Optional[jax.Array] = None


def pose_shapes(shapes: ShapeSet, body_pos, body_quat) -> ShapeSet:
    """Transform local shapes to world given stacked body frames (nb, 3)/(nb, 4)
    (the reference's proxy-model updater, proxy_model_updater.hpp)."""

    def body_of(idx):
        return body_pos[idx], body_quat[idx]

    out = {}
    if shapes.spheres is not None:
        p, q = body_of(shapes.sphere_body)
        out["spheres"] = Sphere(p + rot.qrot(q, shapes.spheres.center), shapes.spheres.radius)
        out["sphere_body"] = shapes.sphere_body
    if shapes.capsules is not None:
        p, q = body_of(shapes.capsule_body)
        out["capsules"] = Capsule(
            p + rot.qrot(q, shapes.capsules.a),
            p + rot.qrot(q, shapes.capsules.b),
            shapes.capsules.radius,
        )
        out["capsule_body"] = shapes.capsule_body
    if shapes.boxes is not None:
        p, q = body_of(shapes.box_body)
        out["boxes"] = Box(
            p + rot.qrot(q, shapes.boxes.center),
            rot.qmul(q, shapes.boxes.quat),
            shapes.boxes.half_extents,
        )
        out["box_body"] = shapes.box_body
    if shapes.cylinders is not None:
        p, q = body_of(shapes.cylinder_body)
        out["cylinders"] = Cylinder(
            p + rot.qrot(q, shapes.cylinders.a),
            p + rot.qrot(q, shapes.cylinders.b),
            shapes.cylinders.radius,
        )
        out["cylinder_body"] = shapes.cylinder_body
    return ShapeSet(**out)

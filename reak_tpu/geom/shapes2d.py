"""2D shape primitives as array records.

(ref: geometry/shapes/circle.hpp, rectangle.hpp, capped_rectangle.hpp,
line_seg_2D.hpp, composite_shape_2D.hpp, kte_chain_geometry.hpp:52 —
kte_chain_geometry_2D)

Same design as :mod:`reak_tpu.geom.shapes`: each shape is a NamedTuple of
arrays with leading batch axes; a composite model is a stacked record.  A
rectangle carries its orientation as a single planar angle (the reference's
``rot_mat_2D``); a capped rectangle is the reference's stadium — a rectangle
whose ±x ends are capped by half-discs, represented here by its spine
half-length and cap radius (= half the y-extent).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Circle(NamedTuple):
    """(ref: geometry/shapes/circle.hpp)"""

    center: jax.Array  # (..., 2)
    radius: jax.Array  # (...)


class Rectangle(NamedTuple):
    """Oriented rectangle (ref: geometry/shapes/rectangle.hpp)."""

    center: jax.Array  # (..., 2)
    angle: jax.Array   # (...)  planar rotation of the local frame
    half: jax.Array    # (..., 2) half-extents along local x/y


class CappedRectangle(NamedTuple):
    """Stadium: rectangle with half-disc caps on the ±x ends
    (ref: geometry/shapes/capped_rectangle.hpp).  ``half_len`` is the spine
    half-length (the flat part along local x); ``radius`` the cap radius
    (= half the y-extent)."""

    center: jax.Array    # (..., 2)
    angle: jax.Array     # (...)
    half_len: jax.Array  # (...)
    radius: jax.Array    # (...)


class Seg2D(NamedTuple):
    """Line segment (ref: geometry/shapes/line_seg_2D.hpp)."""

    a: jax.Array  # (..., 2)
    b: jax.Array  # (..., 2)


def rot2(angle):
    """2x2 rotation matrix (ref: core/kinetostatics/rotations_2D.hpp
    rot_mat_2D) — broadcasts over leading axes."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rot2_apply(angle, v):
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def rect_corners(r: Rectangle):
    """(..., 4, 2) corners in CCW order."""
    u0 = rot2_apply(r.angle, jnp.array([1.0, 0.0]))
    u1 = rot2_apply(r.angle, jnp.array([0.0, 1.0]))
    e0 = r.half[..., 0:1] * u0
    e1 = r.half[..., 1:2] * u1
    c = r.center
    return jnp.stack([c + e0 + e1, c - e0 + e1, c - e0 - e1, c + e0 - e1], axis=-2)


def crect_spine(cr: CappedRectangle):
    """Spine segment endpoints of a capped rectangle: (..., 2), (..., 2)."""
    u = rot2_apply(cr.angle, jnp.array([1.0, 0.0]))
    e = cr.half_len[..., None] * u
    return cr.center - e, cr.center + e


class ShapeSet2D(NamedTuple):
    """Aggregate of same-type 2D shape batches anchored to body indices —
    the planar chain-anchored geometry (ref: kte_chain_geometry.hpp:52
    kte_chain_geometry_2D; posed through FK like proxy_model_updater.hpp).
    """

    circles: Optional[Circle] = None
    rects: Optional[Rectangle] = None
    crects: Optional[CappedRectangle] = None
    segs: Optional[Seg2D] = None
    circle_body: Optional[jax.Array] = None  # (nc,) int body index
    rect_body: Optional[jax.Array] = None
    crect_body: Optional[jax.Array] = None
    seg_body: Optional[jax.Array] = None


def pose_shapes_2d(shapes: ShapeSet2D, body_pos, body_ang) -> ShapeSet2D:
    """Transform local 2D shapes to world given stacked planar body frames
    ``body_pos (nb, 2)``, ``body_ang (nb,)`` (ref: proxy_model_updater.hpp,
    specialized to pose_2D chains)."""

    out = {}
    if shapes.circles is not None:
        p, a = body_pos[shapes.circle_body], body_ang[shapes.circle_body]
        out["circles"] = Circle(p + rot2_apply(a, shapes.circles.center),
                                shapes.circles.radius)
        out["circle_body"] = shapes.circle_body
    if shapes.rects is not None:
        p, a = body_pos[shapes.rect_body], body_ang[shapes.rect_body]
        out["rects"] = Rectangle(p + rot2_apply(a, shapes.rects.center),
                                 a + shapes.rects.angle, shapes.rects.half)
        out["rect_body"] = shapes.rect_body
    if shapes.crects is not None:
        p, a = body_pos[shapes.crect_body], body_ang[shapes.crect_body]
        out["crects"] = CappedRectangle(p + rot2_apply(a, shapes.crects.center),
                                        a + shapes.crects.angle,
                                        shapes.crects.half_len,
                                        shapes.crects.radius)
        out["crect_body"] = shapes.crect_body
    if shapes.segs is not None:
        p, a = body_pos[shapes.seg_body], body_ang[shapes.seg_body]
        out["segs"] = Seg2D(p + rot2_apply(a, shapes.segs.a),
                            p + rot2_apply(a, shapes.segs.b))
        out["seg_body"] = shapes.seg_body
    return ShapeSet2D(**out)

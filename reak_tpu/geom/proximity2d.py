"""2D pairwise SIGNED distance kernels + aggregate proxy-query dispatch.

(ref: geometry/proximity/prox_circle_circle.cpp, prox_circle_rectangle.cpp,
prox_circle_crect.cpp, prox_rectangle_rectangle.cpp, prox_crect_rectangle.cpp,
prox_crect_crect.cpp, proximity_finder_2D.hpp:49, proxy_query_model.hpp:51-92
— proxy_query_pair_2D / proxy_query_model_2D)

All kernels return SIGNED distance (negative = penetration depth), matching
the 3D stack in :mod:`reak_tpu.geom.proximity`:

* circle pairs are exact everywhere (point SDFs minus radii);
* rectangle-rectangle uses edge-pair distances when separated (exact for
  disjoint convex polygons) and the 2D SAT minimum-translation depth on
  overlap (exact for convex polygons — the MTV is along a face normal);
* capped-rectangle (stadium) pairs reduce to spine-segment distances minus
  cap radii — exact while the spines do not cross (the same regime the
  reference's closed-form kernels handle; beyond it the value stays a
  correctly-signed penetration bound).

Everything broadcasts over leading batch axes; ``proxy_query_2d`` evaluates
all registered cross-pairs of two models in one fused batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.geom.shapes2d import (
    CappedRectangle,
    Circle,
    Rectangle,
    Seg2D,
    ShapeSet2D,
    crect_spine,
    rect_corners,
    rot2_apply,
)

_EPS = 1e-30


# ---------------------------------------------------------------------------
# point / segment primitives
# ---------------------------------------------------------------------------


def sdf_point_rect(p, r: Rectangle):
    """Exact signed distance point → oriented rectangle (negative inside)."""
    q = rot2_apply(-r.angle, p - r.center)
    d = jnp.abs(q) - r.half
    outside = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    inside = jnp.minimum(jnp.maximum(d[..., 0], d[..., 1]), 0.0)
    return outside + inside


def closest_on_seg_2d(p, a, b):
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(jnp.sum(ab * ab, axis=-1), _EPS)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def dist_point_seg(p, a, b):
    return jnp.linalg.norm(p - closest_on_seg_2d(p, a, b), axis=-1)


def dist_seg_seg_2d(a0, a1, b0, b1):
    """Min distance between planar segments: 0 when they cross, else the min
    endpoint-to-segment distance (exact — for disjoint planar segments the
    closest pair involves an endpoint)."""
    d1, d2 = a1 - a0, b1 - b0

    def side(p, a, d):
        v = p - a
        return d[..., 0] * v[..., 1] - d[..., 1] * v[..., 0]

    s1, s2 = side(b0, a0, d1), side(b1, a0, d1)
    s3, s4 = side(a0, b0, d2), side(a1, b0, d2)
    crossing = (s1 * s2 < 0.0) & (s3 * s4 < 0.0)
    d = jnp.minimum(
        jnp.minimum(dist_point_seg(a0, b0, b1), dist_point_seg(a1, b0, b1)),
        jnp.minimum(dist_point_seg(b0, a0, a1), dist_point_seg(b1, a0, a1)),
    )
    return jnp.where(crossing, 0.0, d)


# ---------------------------------------------------------------------------
# the reference's six 2D pair kernels (signed)
# ---------------------------------------------------------------------------


def dist_circle_circle(c1: Circle, c2: Circle):
    """(ref: prox_circle_circle.cpp)"""
    return jnp.linalg.norm(c1.center - c2.center, axis=-1) - c1.radius - c2.radius


def dist_circle_rect(c: Circle, r: Rectangle):
    """(ref: prox_circle_rectangle.cpp) — exact signed everywhere."""
    return sdf_point_rect(c.center, r) - c.radius


def dist_circle_crect(c: Circle, cr: CappedRectangle):
    """(ref: prox_circle_crect.cpp)"""
    a, b = crect_spine(cr)
    return dist_point_seg(c.center, a, b) - c.radius - cr.radius


def dist_crect_crect(c1: CappedRectangle, c2: CappedRectangle):
    """(ref: prox_crect_crect.cpp) — spine-segment distance minus radii."""
    a0, a1 = crect_spine(c1)
    b0, b1 = crect_spine(c2)
    return dist_seg_seg_2d(a0, a1, b0, b1) - c1.radius - c2.radius


def _rect_axes(r: Rectangle):
    u0 = rot2_apply(r.angle, jnp.array([1.0, 0.0]))
    u1 = rot2_apply(r.angle, jnp.array([0.0, 1.0]))
    return u0, u1


def _edge_pairs_min(cornersA, cornersB):
    """Min distance over all 4x4 edge pairs of two quads (..., 4, 2)."""
    ia = jnp.arange(4)
    a0 = cornersA
    a1 = jnp.take(cornersA, (ia + 1) % 4, axis=-2)
    b0 = cornersB
    b1 = jnp.take(cornersB, (ia + 1) % 4, axis=-2)
    d = dist_seg_seg_2d(
        a0[..., :, None, :], a1[..., :, None, :],
        b0[..., None, :, :], b1[..., None, :, :],
    )
    return jnp.min(d, axis=(-2, -1))


def dist_rect_rect(r1: Rectangle, r2: Rectangle):
    """(ref: prox_rectangle_rectangle.cpp) — exact signed OBB-OBB: edge-pair
    min distance when disjoint, SAT minimum-translation depth on overlap."""
    u10, u11 = _rect_axes(r1)
    u20, u21 = _rect_axes(r2)
    t = r2.center - r1.center
    seps = []
    for L in (u10, u11, u20, u21):
        ra = (r1.half[..., 0] * jnp.abs(jnp.sum(u10 * L, axis=-1))
              + r1.half[..., 1] * jnp.abs(jnp.sum(u11 * L, axis=-1)))
        rb = (r2.half[..., 0] * jnp.abs(jnp.sum(u20 * L, axis=-1))
              + r2.half[..., 1] * jnp.abs(jnp.sum(u21 * L, axis=-1)))
        seps.append(jnp.abs(jnp.sum(t * L, axis=-1)) - (ra + rb))
    max_sep = jnp.stack(seps, axis=-1).max(axis=-1)
    pos = _edge_pairs_min(rect_corners(r1), rect_corners(r2))
    return jnp.where(max_sep > 0.0, pos, max_sep)


def _signed_seg_rect(a, b, r: Rectangle):
    """Signed distance spine segment → rectangle: SAT (axes = rect faces +
    segment normal) for the overlap depth, edge distances when disjoint."""
    u0, u1 = _rect_axes(r)
    d = b - a
    n = jnp.stack([-d[..., 1], d[..., 0]], axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), _EPS)
    mid = 0.5 * (a + b)
    half_seg = 0.5 * (b - a)
    t = r.center - mid
    seps = []
    for L in (u0, u1, n):
        rs = jnp.abs(jnp.sum(half_seg * L, axis=-1))
        rb = (r.half[..., 0] * jnp.abs(jnp.sum(u0 * L, axis=-1))
              + r.half[..., 1] * jnp.abs(jnp.sum(u1 * L, axis=-1)))
        seps.append(jnp.abs(jnp.sum(t * L, axis=-1)) - (rs + rb))
    max_sep = jnp.stack(seps, axis=-1).max(axis=-1)
    c = rect_corners(r)
    ia = jnp.arange(4)
    e0 = c
    e1 = jnp.take(c, (ia + 1) % 4, axis=-2)
    pos = jnp.min(
        dist_seg_seg_2d(a[..., None, :], b[..., None, :], e0, e1), axis=-1
    )
    return jnp.where(max_sep > 0.0, pos, max_sep)


def dist_crect_rect(cr: CappedRectangle, r: Rectangle):
    """(ref: prox_crect_rectangle.cpp) — signed spine-rectangle distance
    minus the cap radius."""
    a, b = crect_spine(cr)
    return _signed_seg_rect(a, b, r) - cr.radius


def dist_seg_circle(s: Seg2D, c: Circle):
    return dist_point_seg(c.center, s.a, s.b) - c.radius


# ---------------------------------------------------------------------------
# aggregate proxy-query model (2D)
# ---------------------------------------------------------------------------


class ProxyModel2D(NamedTuple):
    """(ref: proxy_query_model_2D, proxy_query_model.hpp:51-92)"""

    circles: Circle | None = None
    rects: Rectangle | None = None
    crects: CappedRectangle | None = None

    @staticmethod
    def from_shapes(s: ShapeSet2D) -> "ProxyModel2D":
        return ProxyModel2D(circles=s.circles, rects=s.rects, crects=s.crects)


def _pairwise(fn, A, B):
    a = jax.tree_util.tree_map(lambda x: x[:, None], A)
    b = jax.tree_util.tree_map(lambda x: x[None, :], B)
    return fn(a, b).min()


def proxy_query_2d(m1: ProxyModel2D, m2: ProxyModel2D):
    """Min signed distance over all registered cross-pairs of two models —
    one fused batch (ref: proxy_query_pair_2D::findMinimumDistance)."""
    best = jnp.inf
    P = [
        (m1.circles, m2.circles, dist_circle_circle),
        (m1.circles, m2.rects, dist_circle_rect),
        (m1.rects, m2.circles, lambda r, c: dist_circle_rect(c, r)),
        (m1.circles, m2.crects, dist_circle_crect),
        (m1.crects, m2.circles, lambda cr, c: dist_circle_crect(c, cr)),
        (m1.rects, m2.rects, dist_rect_rect),
        (m1.crects, m2.crects, dist_crect_crect),
        (m1.crects, m2.rects, dist_crect_rect),
        (m1.rects, m2.crects, lambda r, cr: dist_crect_rect(cr, r)),
    ]
    for A, B, fn in P:
        if A is not None and B is not None:
            best = jnp.minimum(best, _pairwise(fn, A, B))
    return best

"""2D geometry/proximity stack: the reference's six planar pair kernels,
signed distance conventions, batching, aggregate dispatch, and the planar
chain workspace.

(ref: geometry/proximity/prox_circle_circle.cpp, prox_circle_rectangle.cpp,
prox_circle_crect.cpp, prox_rectangle_rectangle.cpp, prox_crect_rectangle.cpp,
prox_crect_crect.cpp, proxy_query_model.hpp:51-92,
geometry/shapes/kte_chain_geometry.hpp:52)
"""
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.geom.shapes2d import (
    CappedRectangle,
    Circle,
    Rectangle,
    Seg2D,
    pose_shapes_2d,
    ShapeSet2D,
)
from reak_tpu.geom import proximity2d as p2


def _c(center, r):
    return Circle(jnp.asarray(center, jnp.float64), jnp.asarray(r, jnp.float64))


def _r(center, angle, half):
    return Rectangle(jnp.asarray(center, jnp.float64), jnp.asarray(angle, jnp.float64),
                     jnp.asarray(half, jnp.float64))


def _cr(center, angle, hl, r):
    return CappedRectangle(jnp.asarray(center, jnp.float64),
                           jnp.asarray(angle, jnp.float64),
                           jnp.asarray(hl, jnp.float64), jnp.asarray(r, jnp.float64))


def test_circle_circle_signed():
    assert np.isclose(p2.dist_circle_circle(_c([0, 0], 1.0), _c([3, 0], 0.5)), 1.5)
    assert np.isclose(p2.dist_circle_circle(_c([0, 0], 1.0), _c([1.2, 0], 0.5)), -0.3)


def test_circle_rect_signed_and_rotation():
    r = _r([0, 0], 0.0, [1.0, 0.5])
    assert np.isclose(p2.dist_circle_rect(_c([2, 0], 0.3), r), 0.7)
    # rotating the rectangle by 90° swaps the half-extents seen along +x
    r90 = _r([0, 0], np.pi / 2, [1.0, 0.5])
    assert np.isclose(p2.dist_circle_rect(_c([2, 0], 0.3), r90), 1.2)
    # circle center inside: exact penetration = -(sdf inside + radius)
    assert np.isclose(p2.dist_circle_rect(_c([0, 0], 0.2), r), -0.7)


def test_circle_crect():
    cr = _cr([0, 0], 0.0, 1.0, 0.25)
    assert np.isclose(p2.dist_circle_crect(_c([2.0, 0], 0.3), cr), 0.45)
    # beyond the cap: distance to the spine END point
    d = p2.dist_circle_crect(_c([1.0 + 3.0, 4.0], 0.1), cr)
    assert np.isclose(d, 5.0 - 0.25 - 0.1)
    # overlapping
    assert p2.dist_circle_crect(_c([0.5, 0.0], 0.3), cr) < 0


def test_rect_rect_separated_and_overlap():
    a = _r([0, 0], 0.0, [1, 1])
    assert np.isclose(p2.dist_rect_rect(a, _r([3, 0], 0.0, [1, 1])), 1.0)
    # corner-corner regime: closest corners (1,1) and (2,2)
    assert np.isclose(p2.dist_rect_rect(a, _r([3, 3], 0.0, [1, 1])), np.sqrt(2.0))
    # axis-aligned overlap: exact minimum-translation depth
    assert np.isclose(p2.dist_rect_rect(a, _r([1.5, 0], 0.0, [1, 1])), -0.5)
    # rotated pair: 45° diamond beside a unit box
    b = _r([2.0 + np.sqrt(2.0), 0.0], np.pi / 4, [1, 1])
    d = p2.dist_rect_rect(a, b)
    assert np.isclose(d, 1.0, atol=1e-12)  # diamond tip at x = 2 + sqrt2 - sqrt2


def test_crect_rect_signed():
    cr = _cr([0, 0], 0.0, 1.0, 0.25)
    assert np.isclose(p2.dist_crect_rect(cr, _r([3, 0], 0.0, [1, 1])), 0.75)
    assert np.isclose(p2.dist_crect_rect(cr, _r([1.5, 0], 0.0, [1, 1])), -0.75)


def test_crect_crect_signed():
    c1 = _cr([0, 0], 0.0, 1.0, 0.2)
    c2 = _cr([0, 1.0], 0.0, 1.0, 0.3)
    assert np.isclose(p2.dist_crect_crect(c1, c2), 0.5)
    crossed = _cr([0, 0], np.pi / 2, 1.0, 0.3)
    assert np.isclose(p2.dist_crect_crect(c1, crossed), -0.5)


def test_seg_seg_2d_crossing_and_parallel():
    z = jnp.float64
    a0, a1 = jnp.array([-1.0, 0.0]), jnp.array([1.0, 0.0])
    b0, b1 = jnp.array([0.0, -1.0]), jnp.array([0.0, 1.0])
    assert np.isclose(p2.dist_seg_seg_2d(a0, a1, b0, b1), 0.0)
    c0, c1 = jnp.array([-1.0, 0.7]), jnp.array([1.0, 0.7])
    assert np.isclose(p2.dist_seg_seg_2d(a0, a1, c0, c1), 0.7)
    assert np.isclose(
        p2.dist_seg_circle(Seg2D(a0, a1), _c([0.0, 1.0], 0.25)), 0.75)


def test_batched_matches_scalar():
    rng = np.random.default_rng(0)
    B = 64
    c = _c(rng.normal(size=(B, 2)), rng.uniform(0.05, 0.4, B))
    r = _r(rng.normal(size=(B, 2)), rng.uniform(-3, 3, B),
           rng.uniform(0.1, 1.0, (B, 2)))
    batched = np.asarray(p2.dist_circle_rect(c, r))
    for i in range(0, B, 7):
        one = p2.dist_circle_rect(
            Circle(c.center[i], c.radius[i]),
            Rectangle(r.center[i], r.angle[i], r.half[i]))
        assert np.isclose(batched[i], float(one), atol=1e-12)


def test_rect_rect_vs_bruteforce_grid():
    """Signed OBB-OBB vs dense point-grid oracle on random pairs."""
    rng = np.random.default_rng(3)
    for _ in range(12):
        r1 = _r(rng.normal(size=2), rng.uniform(-3, 3), rng.uniform(0.2, 1.0, 2))
        r2 = _r(rng.normal(size=2), rng.uniform(-3, 3), rng.uniform(0.2, 1.0, 2))
        d = float(p2.dist_rect_rect(r1, r2))
        # oracle: sample rect-2 boundary densely, take signed point-SDF to rect-1
        ts = np.linspace(0, 1, 400, endpoint=False)
        corners = np.asarray(
            __import__("reak_tpu.geom.shapes2d", fromlist=["rect_corners"]).rect_corners(r2))
        pts = np.concatenate([
            corners[k] + ts[:, None] * (corners[(k + 1) % 4] - corners[k])
            for k in range(4)
        ])
        sdf = np.asarray(p2.sdf_point_rect(jnp.asarray(pts), r1))
        if d >= 0:
            assert abs(d - sdf.min()) < 5e-3, (d, sdf.min())
        else:
            # overlap: some boundary sample penetrates, and the minimum-
            # translation depth is at least as deep as any boundary sample
            # (for near-coincident boxes the MTV is much deeper)
            assert sdf.min() < 1e-9
            assert d <= sdf.min() + 5e-3


def test_proxy_query_2d_aggregate():
    A = p2.ProxyModel2D(circles=_c([[0.0, 0.0], [5.0, 5.0]], [0.5, 0.5]))
    B = p2.ProxyModel2D(
        rects=_r([[3.0, 0.0]], [0.0], [[1.0, 1.0]]),
        crects=_cr([[0.0, 2.0]], [0.0], [1.0], [0.25]),
    )
    d = float(p2.proxy_query_2d(A, B))
    manual = min(
        float(p2.dist_circle_rect(_c([0, 0], 0.5), _r([3, 0], 0.0, [1, 1]))),
        float(p2.dist_circle_crect(_c([0, 0], 0.5), _cr([0, 2], 0.0, 1.0, 0.25))),
        float(p2.dist_circle_rect(_c([5, 5], 0.5), _r([3, 0], 0.0, [1, 1]))),
        float(p2.dist_circle_crect(_c([5, 5], 0.5), _cr([0, 2], 0.0, 1.0, 0.25))),
    )
    assert np.isclose(d, manual)


def test_pose_shapes_2d_rigid():
    s = ShapeSet2D(
        circles=_c([[1.0, 0.0]], [0.1]), circle_body=jnp.array([0]),
        crects=_cr([[0.5, 0.0]], [0.0], [0.5], [0.1]), crect_body=jnp.array([0]),
    )
    posed = pose_shapes_2d(s, jnp.array([[1.0, 2.0]]), jnp.array([np.pi / 2]))
    np.testing.assert_allclose(np.asarray(posed.circles.center[0]), [1.0, 3.0],
                               atol=1e-12)
    np.testing.assert_allclose(float(posed.crects.angle[0]), np.pi / 2)
    np.testing.assert_allclose(np.asarray(posed.crects.center[0]), [1.0, 2.5],
                               atol=1e-12)


def test_planar_chain_workspace_collision():
    """Planar 2-link arm with stadium links vs a circle obstacle through the
    full 2D chain stack (ref: kte_chain_geometry_2D + manip_quasi_static_env)."""
    from reak_tpu.kte import models
    from reak_tpu import spaces as sp
    from reak_tpu.planning.workspace import PlanarChainWorkspace

    spec = models.planar_2link(l1=0.4, l2=0.3)
    robot = ShapeSet2D(
        crects=CappedRectangle(
            center=jnp.array([[0.2, 0.0], [0.15, 0.0]]),
            angle=jnp.zeros(2),
            half_len=jnp.array([0.2, 0.15]),
            radius=jnp.array([0.05, 0.05]),
        ),
        crect_body=jnp.array([0, 1]),
    )
    env = p2.ProxyModel2D(circles=_c([[0.55, 0.0]], [0.1]))
    space = sp.HyperboxSpace(jnp.full(2, -np.pi), jnp.full(2, np.pi))
    ws = PlanarChainWorkspace(space, spec, robot, env)
    qs = jnp.array([[0.0, 0.0],        # stretched along +x → hits the circle
                    [np.pi / 2, 0.0]])  # pointing up → clear
    free = np.asarray(ws.is_free_batch(qs))
    assert not free[0] and free[1]
    d = np.asarray(ws.min_distance_batch(qs))
    assert d[0] < 0 < d[1]

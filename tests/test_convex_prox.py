"""Alternating-projection convex proximity (geom/convex.py) — exactness vs
closed forms, hard pairs (box-box, cylinder-cylinder), batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.geom import convex
from reak_tpu.geom.shapes import Box, Capsule, Cylinder, Sphere
from reak_tpu.math import rotations as rot


def _box(center, half, quat=None):
    q = jnp.array([1.0, 0, 0, 0]) if quat is None else quat
    return Box(jnp.asarray(center, jnp.float64), q,
               jnp.asarray(half, jnp.float64))


class TestProjections:
    def test_box_projection(self):
        b = _box([0.0, 0, 0], [1.0, 2.0, 0.5])
        p = jnp.array([3.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(convex.project_box(p, b)),
                                   [1.0, 0.0, 0.0], atol=1e-14)

    def test_cylinder_projection_side_and_cap(self):
        c = Cylinder(jnp.array([0.0, 0, 0.0]), jnp.array([0.0, 0, 2.0]),
                     jnp.asarray(0.5))
        side, _ = convex.project_cylinder(jnp.array([2.0, 0.0, 1.0]), c)
        np.testing.assert_allclose(np.asarray(side), [0.5, 0, 1.0], atol=1e-12)
        cap, _ = convex.project_cylinder(jnp.array([0.2, 0.0, 5.0]), c)
        np.testing.assert_allclose(np.asarray(cap), [0.2, 0, 2.0], atol=1e-12)
        # inside → identity (set projection)
        inside, _ = convex.project_cylinder(jnp.array([0.1, 0.0, 1.0]), c)
        np.testing.assert_allclose(np.asarray(inside), [0.1, 0, 1.0], atol=0)


class TestPairs:
    def test_sphere_sphere_matches_closed_form(self):
        s1 = Sphere(jnp.array([0.0, 0, 0]), jnp.asarray(0.5))
        s2 = Sphere(jnp.array([3.0, 0, 0]), jnp.asarray(0.7))
        r = convex.convex_pair(s1, s2)
        assert abs(float(r.distance) - 1.8) < 1e-9

    def test_box_box_axis_aligned_gap(self):
        b1 = _box([0.0, 0, 0], [1.0, 1, 1])
        b2 = _box([4.0, 0, 0], [1.0, 1, 1])
        d = convex.dist_box_box(b1, b2)
        assert abs(float(d) - 2.0) < 1e-9

    def test_box_box_rotated(self):
        # 45°-rotated unit box: corner points toward the other box
        q = rot.q_from_axis_angle(jnp.array([0.0, 0, 1.0]), jnp.pi / 4)
        b1 = _box([0.0, 0, 0], [1.0, 1, 1], q)
        b2 = _box([4.0, 0, 0], [1.0, 1, 1])
        d = float(convex.dist_box_box(b1, b2, iters=200))
        expect = 4.0 - np.sqrt(2.0) - 1.0
        assert abs(d - expect) < 1e-5

    def test_box_box_overlap_is_negative_depth(self):
        """Overlapping boxes: signed distance = −(minimal translation)
        (ref: findProximityByGJKEPA depth, prox_fundamentals_3D.hpp:57)."""
        b1 = _box([0.0, 0, 0], [1.0, 1, 1])
        b2 = _box([1.5, 0, 0], [1.0, 1, 1])
        # x-overlap = 1+1−1.5 = 0.5 is the minimal translation
        assert abs(float(convex.dist_box_box(b1, b2)) - (-0.5)) < 1e-6


class TestSignedDepth:
    """Penetration-depth branch of geom/convex.signed_pair (VERDICT r2 §4)."""

    def test_box_box_axis_aligned_analytic(self):
        # overlap extents: x: 1.6−1.3=…  compute per-axis mt and take min
        b1 = _box([0.0, 0.0, 0.0], [1.0, 0.8, 0.6])
        b2 = _box([1.3, 0.2, 0.1], [0.7, 0.9, 0.5])
        mtx = 1.0 + 0.7 - 1.3   # 0.4
        mty = 0.8 + 0.9 - 0.2   # 1.5
        mtz = 0.6 + 0.5 - 0.1   # 1.0
        depth = min(mtx, mty, mtz)
        r = convex.signed_pair(b1, b2)
        assert abs(float(r.distance) + depth) < 1e-6

    def test_box_box_rotated_depth(self):
        # 45°-rotated unit box centered above another: depth along z is
        # analytic: top box corner reaches down to z = c_z − hz; overlap
        # against top face z=1 of the lower box
        q = rot.q_from_axis_angle(jnp.array([0.0, 0, 1.0]), jnp.pi / 4)
        b1 = _box([0.0, 0, 0], [1.0, 1, 1])
        b2 = _box([0.0, 0, 1.5], [1.0, 1, 1], quat=q)
        r = convex.signed_pair(b1, b2)
        assert abs(float(r.distance) + 0.5) < 1e-6

    def test_separated_matches_pocs(self):
        b1 = _box([0.0, 0, 0], [1.0, 1, 1])
        b2 = _box([4.0, 0, 0], [1.0, 1, 1])
        r = convex.signed_pair(b1, b2)
        assert abs(float(r.distance) - 2.0) < 1e-6
        np.testing.assert_allclose(np.asarray(r.point_a)[0], 1.0, atol=1e-6)

    def test_sphere_sphere_depth_exact(self):
        s1 = Sphere(jnp.array([0.0, 0, 0]), jnp.asarray(1.0))
        s2 = Sphere(jnp.array([1.2, 0, 0]), jnp.asarray(0.5))
        r = convex.signed_pair(s1, s2)
        assert abs(float(r.distance) - (1.2 - 1.5)) < 1e-6

    def test_cylinder_box_overlap_depth(self):
        # axis-aligned: cylinder along z, radius .5, overlapping box side
        c = Cylinder(jnp.array([1.2, 0.0, -1.0]), jnp.array([1.2, 0.0, 1.0]),
                     jnp.asarray(0.5))
        b = _box([0.0, 0, 0], [1.0, 1, 1])
        # radial overlap along x: (1.0) − (1.2 − 0.5) = 0.3
        d = convex.dist_cylinder_box(c, b)
        assert abs(float(d) + 0.3) < 5e-3

    def test_cylinder_cylinder_axial_depth(self):
        c1 = Cylinder(jnp.array([0.0, 0, 0.0]), jnp.array([0.0, 0, 2.0]),
                      jnp.asarray(0.5))
        c2 = Cylinder(jnp.array([0.0, 0, 1.5]), jnp.array([0.0, 0, 3.5]),
                      jnp.asarray(0.5))
        # coaxial: radial translation 1.0 beats axial 0.5?  axial overlap
        # = 0.5, radial mt = r1+r2 = 1.0 → depth 0.5 (axial)
        d = convex.dist_cylinder_cylinder(c1, c2)
        assert abs(float(d) + 0.5) < 5e-3

    def test_depth_batched_jitted(self, rng):
        centers = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 3)))
        b1 = Box(centers, jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (32, 4)),
                 jnp.broadcast_to(jnp.array([1.0, 1, 1]), (32, 3)))
        b2 = _box([0.0, 0, 0], [1.0, 1, 1])
        b2 = Box(jnp.broadcast_to(b2.center, (32, 3)),
                 jnp.broadcast_to(b2.quat, (32, 4)),
                 jnp.broadcast_to(b2.half_extents, (32, 3)))
        f = jax.jit(lambda a, b: convex.signed_pair(a, b).distance)
        d = f(b1, b2)
        assert d.shape == (32,)
        # all overlapping: depth = 2 − max|Δ| along the best axis
        expect = -(2.0 - np.max(np.abs(np.asarray(centers)), axis=1))
        np.testing.assert_allclose(np.asarray(d), expect, atol=1e-5)

    def test_cylinder_cylinder_flat_caps(self):
        """Coaxial cylinders gap = axial separation — the case the capsule
        approximation gets WRONG (capsules would add the radii)."""
        c1 = Cylinder(jnp.array([0.0, 0, 0.0]), jnp.array([0.0, 0, 1.0]),
                      jnp.asarray(0.5))
        c2 = Cylinder(jnp.array([0.0, 0, 3.0]), jnp.array([0.0, 0, 4.0]),
                      jnp.asarray(0.5))
        d = float(convex.dist_cylinder_cylinder(c1, c2))
        assert abs(d - 2.0) < 1e-6
        # capsule approximation for reference: 2.0 − 2·0.5 = 1.0
        from reak_tpu.geom.proximity import dist_capsule_capsule
        d_cap = dist_capsule_capsule(Capsule(c1.a, c1.b, c1.radius),
                                     Capsule(c2.a, c2.b, c2.radius))
        assert abs(float(d_cap) - 1.0) < 1e-9

    def test_cylinder_box(self):
        c = Cylinder(jnp.array([0.0, 0, 0.0]), jnp.array([0.0, 0, 1.0]),
                     jnp.asarray(0.5))
        b = _box([3.0, 0, 0.5], [1.0, 1, 1])
        d = float(convex.dist_cylinder_box(c, b))
        assert abs(d - 1.5) < 1e-6

    def test_batched_and_jitted(self, rng):
        K = 32
        centers = jnp.asarray(rng.uniform(3, 6, (K, 3)))
        b1 = Box(jnp.zeros((K, 3)), jnp.tile(jnp.array([1.0, 0, 0, 0]), (K, 1)),
                 jnp.ones((K, 3)))
        b2 = Box(centers, jnp.tile(jnp.array([1.0, 0, 0, 0]), (K, 1)),
                 jnp.ones((K, 3)) * 0.5)
        f = jax.jit(lambda a, b: convex.convex_pair(a, b).distance)
        d = f(b1, b2)
        assert d.shape == (K,)
        assert bool(jnp.all(d >= 0)) and bool(jnp.all(jnp.isfinite(d)))


class TestProxyQueryDispatch:
    """The aggregate proxy_query must route the hard pairs through the exact
    convex kernels (ref: proxy_query_model.hpp:155 full pair dispatch)."""

    def test_box_box_in_aggregate(self):
        from reak_tpu.geom import ProxyModel, proxy_query

        m1 = ProxyModel(boxes=Box(jnp.zeros((1, 3)),
                                  jnp.array([[1.0, 0, 0, 0]]),
                                  jnp.ones((1, 3))))
        m2 = ProxyModel(boxes=Box(jnp.array([[5.0, 0.0, 0.0]]),
                                  jnp.array([[1.0, 0, 0, 0]]),
                                  jnp.ones((1, 3))))
        np.testing.assert_allclose(float(proxy_query(m1, m2)), 3.0, atol=1e-6)

    def test_cylinder_pairs_in_aggregate(self):
        from reak_tpu.geom import ProxyModel, proxy_query

        cyl = Cylinder(jnp.array([[0.0, 0, 0]]), jnp.array([[0.0, 0, 2.0]]),
                       jnp.array([0.5]))
        m1 = ProxyModel(cylinders=cyl)
        # sphere 3 m off-axis: gap = 3 − 0.5(cyl) − 0.5(sphere) = 2
        m2 = ProxyModel(spheres=Sphere(jnp.array([[3.0, 0.0, 1.0]]),
                                       jnp.array([0.5])))
        np.testing.assert_allclose(float(proxy_query(m1, m2)), 2.0, atol=1e-9)
        # coaxial cylinder above: flat-cap gap is axial = 1 (capsule approx
        # would report 1 − 0.5 − 0.4 = 0.1)
        m3 = ProxyModel(cylinders=Cylinder(jnp.array([[0.0, 0, 3.0]]),
                                           jnp.array([[0.0, 0, 5.0]]),
                                           jnp.array([0.4])))
        np.testing.assert_allclose(float(proxy_query(m1, m3)), 1.0, atol=1e-5)

    def test_capsule_box_exact_in_aggregate(self):
        from reak_tpu.geom import ProxyModel, proxy_query

        # capsule diagonal over a box corner — the old 8-sample approximation
        # overestimates unless a sample lands at the closest point
        cap = Capsule(jnp.array([[2.0, -1.0, 0.37]]),
                      jnp.array([[2.0, 1.0, 0.37]]), jnp.array([0.25]))
        m1 = ProxyModel(capsules=cap)
        m2 = ProxyModel(boxes=Box(jnp.zeros((1, 3)),
                                  jnp.array([[1.0, 0, 0, 0]]),
                                  jnp.ones((1, 3))))
        np.testing.assert_allclose(float(proxy_query(m1, m2)), 0.75, atol=1e-6)

    def test_cylinder_plane_in_aggregate(self):
        from reak_tpu.geom import Plane, ProxyModel, proxy_query

        # tilted cylinder over the floor: rim dips below the axis endpoint
        axis45 = jnp.array([[1.0, 0.0, 1.0]]) / np.sqrt(2.0)
        cyl = Cylinder(jnp.array([[0.0, 0.0, 2.0]]),
                       jnp.array([[0.0, 0.0, 2.0]]) + 2.0 * axis45,
                       jnp.array([0.5]))
        m1 = ProxyModel(cylinders=cyl)
        m2 = ProxyModel(planes=Plane(jnp.array([[0.0, 0, 1.0]]),
                                     jnp.array([0.0])))
        # lower cap center at z=2, rim drop = r·sin(45°)
        expect = 2.0 - 0.5 / np.sqrt(2.0)
        np.testing.assert_allclose(float(proxy_query(m1, m2)), expect, atol=1e-9)

"""Order-1/2 tangent-bundle spaces + reachability space tests.

(parity model: ref differentiable_space.hpp:220, Ndof_spaces.hpp,
se3_topologies.hpp:384, reachability_space.hpp:180,237)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reak_tpu.spaces as sp
from reak_tpu.spaces.temporal import TemporalPoint


def _ndof1():
    return sp.Ndof1stOrderSpace(
        lower=jnp.array([-2.0, -1.0]),
        upper=jnp.array([2.0, 1.0]),
        speed=jnp.array([1.0, 0.5]),
    )


class TestNdof1stOrder:
    def test_sample_within_limits(self):
        s = _ndof1()
        p = s.sample(jax.random.PRNGKey(0), (200,))
        assert bool(jnp.all(jnp.abs(p.qd) <= s.speed + 1e-9))
        assert bool(jnp.all((p.q >= s.lower) & (p.q <= s.upper)))

    def test_distance_is_reach_time(self):
        s = _ndof1()
        # rest-to-rest joint 0 move of 1 rad at vmax=1 (ramp=vmax):
        # triangular profile T = 2 s
        a = sp.NdofPoint1(jnp.array([0.0, 0.0]), jnp.zeros(2))
        b = sp.NdofPoint1(jnp.array([1.0, 0.0]), jnp.zeros(2))
        np.testing.assert_allclose(s.distance(a, b), 2.0, atol=1e-9)

    def test_interpolate_endpoints_and_continuity(self):
        s = _ndof1()
        key = jax.random.PRNGKey(1)
        a = s.clamp(s.sample(key))
        b = s.clamp(s.sample(jax.random.PRNGKey(2)))
        p0 = s.interpolate(a, b, 0.0)
        p1 = s.interpolate(a, b, 1.0)
        np.testing.assert_allclose(p0.q, a.q, atol=1e-8)
        np.testing.assert_allclose(p0.qd, a.qd, atol=1e-8)
        np.testing.assert_allclose(p1.q, b.q, atol=1e-6)
        np.testing.assert_allclose(p1.qd, b.qd, atol=1e-7)
        # interior points respect the speed limit (the whole point of SVP)
        for t in np.linspace(0.05, 0.95, 10):
            pm = s.interpolate(a, b, float(t))
            assert bool(jnp.all(jnp.abs(pm.qd) <= s.speed + 1e-6))


class TestNdof2ndOrder:
    @pytest.mark.slow  # compile-heavy on XLA-CPU; covered by cheaper siblings in the default run
    def test_interpolate_respects_accel_limit(self):
        s = sp.Ndof2ndOrderSpace(
            lower=jnp.array([-3.0]),
            upper=jnp.array([3.0]),
            speed=jnp.array([1.0]),
            accel=jnp.array([2.0]),
        )
        a = sp.NdofPoint2(jnp.array([0.0]), jnp.array([0.3]), jnp.zeros(1))
        b = sp.NdofPoint2(jnp.array([2.0]), jnp.array([-0.2]), jnp.zeros(1))
        assert float(s.distance(a, b)) > 0
        for t in np.linspace(0.0, 1.0, 21):
            pm = s.interpolate(a, b, float(t))
            assert bool(jnp.all(jnp.abs(pm.qd) <= s.speed + 1e-6))
            assert bool(jnp.all(jnp.abs(pm.qdd) <= s.accel + 1e-6))
        pT = s.interpolate(a, b, 1.0)
        np.testing.assert_allclose(pT.q, b.q, atol=5e-3)
        np.testing.assert_allclose(pT.qd, b.qd, atol=1e-6)

    def test_factory_order_dispatch(self):
        lo, hi = jnp.zeros(2), jnp.ones(2)
        assert sp.make_ndof_space(lo, hi).dim == 2
        assert isinstance(
            sp.make_ndof_space(lo, hi, speed=jnp.ones(2)), sp.Ndof1stOrderSpace
        )
        assert isinstance(
            sp.make_ndof_space(lo, hi, speed=jnp.ones(2), accel=jnp.ones(2)),
            sp.Ndof2ndOrderSpace,
        )


class TestReachability:
    def test_reachable_distance(self):
        base = sp.RateLimitedNdofSpace(
            sp.rate_limited.JointLimits(
                lower=jnp.array([-5.0]), upper=jnp.array([5.0]), speed=jnp.array([1.0])
            )
        )
        rs = sp.ReachabilitySpace(base, t_max=10.0)
        a = TemporalPoint(jnp.asarray(1.0), jnp.array([0.0]))
        # 1 rad away (1 s of travel), 2 s later → reachable, d = Δt + reach
        b = TemporalPoint(jnp.asarray(3.0), jnp.array([1.0]))
        np.testing.assert_allclose(rs.distance(a, b), 3.0, atol=1e-9)
        # symmetric direction also finite (metric, not quasi-metric)
        np.testing.assert_allclose(rs.distance(b, a), 3.0, atol=1e-9)
        # 3 rad away but only 1 s later in either direction → unreachable
        c = TemporalPoint(jnp.asarray(2.0), jnp.array([3.0]))
        assert np.isinf(float(rs.distance(a, c)))
        # reach_plus_time is directed
        assert np.isfinite(float(rs.reach_plus_time(a, b)))
        assert np.isinf(float(rs.reach_plus_time(b, a)))

    def test_reach_norms(self):
        base = sp.RateLimitedNdofSpace(
            sp.rate_limited.JointLimits(
                lower=jnp.array([-5.0]), upper=jnp.array([5.0]), speed=jnp.array([1.0])
            )
        )
        org = TemporalPoint(jnp.asarray(0.0), jnp.array([0.0]))
        rs = sp.ReachabilitySpace(base, t_max=10.0, origin=org)
        p = TemporalPoint(jnp.asarray(4.0), jnp.array([1.0]))
        np.testing.assert_allclose(rs.forward_reach(p), 5.0, atol=1e-9)
        np.testing.assert_allclose(rs.backward_reach(p), 3.0, atol=1e-9)


class TestSE3Orders:
    def test_first_order_roundtrip(self):
        s = sp.SE31stOrderSpace(
            pos_lower=jnp.array([-1.0, -1.0, -1.0]),
            pos_upper=jnp.array([1.0, 1.0, 1.0]),
            max_speed=2.0,
            max_ang_speed=1.0,
        )
        a = s.sample(jax.random.PRNGKey(0))
        b = s.sample(jax.random.PRNGKey(1))
        assert float(jnp.linalg.norm(a.vel)) <= 2.0 + 1e-9
        assert float(jnp.linalg.norm(a.omega)) <= 1.0 + 1e-9
        d = s.distance(a, b)
        assert np.isfinite(float(d)) and float(d) >= 0
        np.testing.assert_allclose(s.distance(a, a), 0.0, atol=1e-9)
        mid = s.interpolate(a, b, 1.0)
        np.testing.assert_allclose(mid.pos, b.pos, atol=1e-9)
        np.testing.assert_allclose(jnp.abs(jnp.sum(mid.quat * b.quat)), 1.0, atol=1e-9)
        np.testing.assert_allclose(mid.vel, b.vel, atol=1e-9)

    def test_second_order_and_factory(self):
        s = sp.make_se3_space(
            jnp.zeros(3),
            jnp.ones(3),
            order=2,
            max_speed=1.0,
            max_ang_speed=1.0,
            max_acc=3.0,
            max_ang_acc=2.0,
        )
        assert isinstance(s, sp.SE32ndOrderSpace)
        a = s.sample(jax.random.PRNGKey(2), (8,))
        assert a.acc.shape == (8, 3)
        assert bool(jnp.all(jnp.linalg.norm(a.acc, axis=-1) <= 3.0 + 1e-9))
        d = s.distance(a, a)
        np.testing.assert_allclose(d, 0.0, atol=1e-9)
        clamped = s.clamp(a)
        np.testing.assert_allclose(clamped.quat, a.quat, atol=1e-9)


class TestSE2Orders:
    """SE(2) pose + tangent bundles (ref: ctrl/topologies/se2_topologies.hpp:
    62,85,114 and the rate-limited variants :230+)."""

    def test_heading_wraps(self):
        s = sp.SE2Space(jnp.full(2, -1.0), jnp.full(2, 1.0))
        a = sp.se2.SE2Point(jnp.zeros(2), jnp.asarray(3.0))
        b = sp.se2.SE2Point(jnp.zeros(2), jnp.asarray(-3.0))
        # short way around the circle: |3 - (-3)| wraps to 2π - 6 ≈ 0.283
        np.testing.assert_allclose(float(s.distance(a, b)),
                                   2 * np.pi - 6.0, atol=1e-6)
        mid = s.interpolate(a, b, 0.5)
        # midpoint of the short arc crosses ±π, not 0
        assert abs(abs(float(mid.theta)) - np.pi) < 1e-6
        end = s.interpolate(a, b, 1.0)
        np.testing.assert_allclose(
            float(sp.se2.wrap_angle(end.theta - b.theta)), 0.0, atol=1e-6)

    def test_first_order_metric_is_travel_time(self):
        s = sp.SE21stOrderSpace(
            pos_lower=jnp.full(2, -5.0), pos_upper=jnp.full(2, 5.0),
            max_speed=2.0, max_ang_speed=1.0, max_acc=4.0, max_ang_acc=2.0)
        a = s.sample(jax.random.PRNGKey(0), (16,))
        assert a.pos.shape == (16, 2) and a.omega.shape == (16,)
        assert bool(jnp.all(jnp.linalg.norm(a.vel, axis=-1) <= 2.0 + 1e-9))
        assert bool(jnp.all(jnp.abs(a.omega) <= 1.0 + 1e-9))
        b = s.sample(jax.random.PRNGKey(1), (16,))
        d = s.distance(a, b)
        np.testing.assert_allclose(d, s.distance(b, a), atol=1e-9)
        np.testing.assert_allclose(s.distance(a, a), 0.0, atol=1e-9)
        # pure 2 m translation at 2 m/s ⇒ 1 s
        p = sp.se2.SE2Point1(jnp.zeros(2), jnp.asarray(0.0),
                             jnp.zeros(2), jnp.asarray(0.0))
        q = sp.se2.SE2Point1(jnp.array([2.0, 0.0]), jnp.asarray(0.0),
                             jnp.zeros(2), jnp.asarray(0.0))
        np.testing.assert_allclose(float(s.distance(p, q)), 1.0, atol=1e-9)

    def test_second_order_and_factory(self):
        s = sp.make_se2_space(
            jnp.zeros(2), jnp.ones(2), order=2,
            max_speed=1.0, max_ang_speed=1.0, max_acc=3.0, max_ang_acc=2.0)
        assert isinstance(s, sp.SE22ndOrderSpace)
        a = s.sample(jax.random.PRNGKey(2), (8,))
        assert a.acc.shape == (8, 2) and a.alpha.shape == (8,)
        assert bool(jnp.all(jnp.linalg.norm(a.acc, axis=-1) <= 3.0 + 1e-9))
        np.testing.assert_allclose(s.distance(a, a), 0.0, atol=1e-9)
        b = s.sample(jax.random.PRNGKey(3), (8,))
        end = s.interpolate(a, b, 1.0)
        np.testing.assert_allclose(end.acc, b.acc, atol=1e-9)
        big = sp.se2.SE2Point2(a.pos, a.theta, a.vel, a.omega,
                               a.acc * 100.0, a.alpha * 100.0)
        cl = s.clamp(big)
        assert bool(jnp.all(jnp.linalg.norm(cl.acc, axis=-1) <= 3.0 + 1e-6))
        assert bool(jnp.all(jnp.abs(cl.alpha) <= 2.0 + 1e-9))


class TestRendezvous:
    """Intercept planning in time × 1st-order joint space (VERDICT item 5's
    'Done' criterion; ref composition: intercept_query.hpp:75 over a
    1st-order rate-limited topology + reachability pruning)."""

    def test_velocity_matched_interception(self):
        import reak_tpu.planning as pl

        space1 = sp.Ndof1stOrderSpace(
            lower=jnp.full(2, -6.0), upper=jnp.full(2, 6.0),
            speed=jnp.full(2, 1.5))
        ws = pl.NoObstacleWorkspace(
            sp.HyperboxSpace(jnp.full(2, -6.0), jnp.full(2, 6.0)))

        def target(t):
            # target glides with CONSTANT VELOCITY — a rendezvous must match
            # both position and velocity, which a 0th-order planner cannot
            return (np.array([2.0 - 0.4 * t, 1.0 + 0.3 * t]),
                    np.array([-0.4, 0.3]))

        q = pl.RendezvousQuery(
            start_q=jnp.zeros(2), start_qd=jnp.zeros(2),
            target_traj=target, t_budget=10.0, goal_tol=0.2)
        res = pl.intercept_plan_1st_order(ws, space1, q, max_iters=80,
                                          batch=32, seed=0)
        assert res.success, res
        t_hit = float(res.cost)
        row = np.asarray(res.path[-1])
        q_hit, qd_hit = row[1:3], row[3:5]
        tgt_q, tgt_qd = target(t_hit)
        # reach-time ball of 0.2 s ⇒ position within ~speed·tol, velocity
        # within ~a_ramp·tol of the target state
        assert np.linalg.norm(q_hit - tgt_q) < 0.5
        assert np.linalg.norm(qd_hit - tgt_qd) < 0.5
        # the plan is velocity-continuous from rest: first waypoint at rest
        np.testing.assert_allclose(res.path[0, 3:5], 0.0, atol=1e-9)
        # all waypoint velocities within the speed limit
        assert float(jnp.max(jnp.abs(res.path[:, 3:5]))) <= 1.5 + 1e-6


class TestDifferentiableSpace:
    """Generic order-N composition (ref differentiable_space.hpp:220;
    VERDICT r2 missing item 7)."""

    def test_order3_ndof_bundle(self, rng):
        import jax
        from reak_tpu.spaces import make_differentiable_ndof

        sp3 = make_differentiable_ndof(
            jnp.zeros(2), jnp.ones(2) * 4.0,
            bounds=[jnp.ones(2) * 2.0, jnp.ones(2) * 5.0, jnp.ones(2) * 9.0])
        assert sp3.order == 3
        a = sp3.sample(jax.random.PRNGKey(0))
        b = sp3.sample(jax.random.PRNGKey(1))
        assert len(a) == 4
        d = float(sp3.distance(a, b))
        assert d > 0 and np.isfinite(d)
        mid = sp3.interpolate(a, b, 0.5)
        # level-wise lerp for hyperbox levels
        for k in range(4):
            np.testing.assert_allclose(np.asarray(mid[k]),
                                       0.5 * (np.asarray(a[k]) + np.asarray(b[k])),
                                       atol=1e-12)
        np.testing.assert_allclose(float(sp3.distance(a, a)), 0.0, atol=1e-12)

    def test_heterogeneous_levels_so3(self):
        """Order-1 bundle over SO(3) x R^3: level differentiation via the
        base space's own difference rule (body angular velocity)."""
        import jax
        from reak_tpu.spaces import DifferentiableSpace, SO3Space, HyperboxSpace
        from reak_tpu.math import rotations as rot

        so3 = SO3Space()
        w_space = HyperboxSpace(-jnp.ones(3) * 3.0, jnp.ones(3) * 3.0)
        bundle = DifferentiableSpace([so3, w_space])
        assert bundle.order == 1
        # lift: finite-difference of a rotating trajectory recovers omega
        w_true = jnp.array([0.3, -0.2, 0.5])
        dt = 1e-3
        q0 = rot.q_from_axis_angle(jnp.array([0.0, 0, 1.0]), 0.4)
        q1 = rot.qmul(q0, rot.q_exp(w_true * dt))
        p_prev = (q0, jnp.zeros(3))
        p_now = (q1, jnp.zeros(3))
        lifted = bundle.lift(p_prev, p_now, dt)
        np.testing.assert_allclose(np.asarray(lifted[1]), np.asarray(w_true),
                                   rtol=1e-3, atol=1e-5)

    def test_flow_advances_levels(self):
        from reak_tpu.spaces import make_differentiable_ndof

        sp2 = make_differentiable_ndof(
            -jnp.ones(1) * 10, jnp.ones(1) * 10,
            bounds=[jnp.ones(1) * 5.0, jnp.ones(1) * 5.0])
        p = (jnp.array([1.0]), jnp.array([2.0]), jnp.array([0.5]))
        p1 = sp2.flow(p, 0.1)
        np.testing.assert_allclose(np.asarray(p1[0]), [1.2], atol=1e-12)
        np.testing.assert_allclose(np.asarray(p1[1]), [2.05], atol=1e-12)
        np.testing.assert_allclose(np.asarray(p1[2]), [0.5], atol=1e-12)


class TestReachabilitySort:
    """ReachabilitySortedSet (ref: path_planning/reachability_sort.hpp)."""

    def _mk(self, rng, N=64):
        import jax
        from reak_tpu.spaces import HyperboxSpace
        from reak_tpu.spaces.tangent import ReachabilitySpace
        from reak_tpu.spaces.temporal import TemporalPoint
        from reak_tpu.planning.reach_sort import ReachabilitySortedSet

        base = HyperboxSpace(jnp.zeros(2), jnp.ones(2) * 4.0)
        org = TemporalPoint(jnp.asarray(0.0), jnp.zeros(2))
        space = ReachabilitySpace(base, t_max=10.0, origin=org)
        times = jnp.asarray(rng.uniform(0, 10, N))
        pts = jnp.asarray(rng.uniform(0, 4, (N, 2)))
        return space, ReachabilitySortedSet(space, times, pts), TemporalPoint

    def test_prune_has_no_false_negatives(self, rng):
        space, rset, TP = self._mk(rng)
        for t, p in [(2.0, [1.0, 1.0]), (5.0, [3.0, 0.5]), (0.0, [0.0, 0.0])]:
            tp = TP(jnp.asarray(t), jnp.asarray(p))
            exact = np.asarray(rset.reachable_from(tp))
            cand = np.asarray(rset.candidate_mask_from(tp))
            assert not (exact & ~cand).any(), "prune dropped a reachable point"
            # and it actually prunes something on generic queries
        assert cand.sum() < rset.size

    def test_exact_matches_bruteforce(self, rng):
        space, rset, TP = self._mk(rng, N=40)
        tp = TP(jnp.asarray(3.0), jnp.asarray([2.0, 2.0]))
        exact = np.asarray(rset.reachable_from(tp))
        times = np.asarray(rset.times)
        pts = np.asarray(rset.points)
        for i in range(40):
            dt = times[i] - 3.0
            d = np.linalg.norm(pts[i] - np.array([2.0, 2.0]))
            assert exact[i] == (dt >= 0 and d <= dt)

    def test_nearest_reachable_is_min_reach_plus_time(self, rng):
        space, rset, TP = self._mk(rng)
        tp = TP(jnp.asarray(1.0), jnp.asarray([1.5, 1.5]))
        i, v = rset.nearest_reachable(tp)
        times = np.asarray(rset.times)
        pts = np.asarray(rset.points)
        dt = times - 1.0
        d = np.linalg.norm(pts - np.array([1.5, 1.5]), axis=1)
        metric = np.where((dt >= 0) & (d <= dt), dt + d, np.inf)
        assert abs(float(v) - metric.min()) < 1e-9

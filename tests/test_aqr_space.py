"""IHAQR / MEAQR control topologies (ref: misc/IHAQR_topology.hpp:183,
misc/MEAQR_topology.hpp:316, MEAQR_rrtstar_planner.hpp:78)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.ctrl.aqr_space import (MEAQRSpace, IHAQRSpace, AQRWorkspace,
                                     meaqr_rrt_star_plan)
from reak_tpu.planning.queries import PlanningQuery

A = jnp.array([[0.0, 1.0], [0.0, 0.0]])   # double integrator
B = jnp.array([[0.0], [1.0]])
LO = jnp.array([-5.0, -3.0])
HI = jnp.array([5.0, 3.0])


@pytest.fixture(scope="module")
def meaqr():
    return MEAQRSpace(A, B, lower=LO, upper=HI, t_max=3.0, n_grid=32,
                      time_weight=0.1)


@pytest.fixture(scope="module")
def ihaqr():
    return IHAQRSpace(A, B, lower=LO, upper=HI, t_horizon=6.0)


class TestMEAQR:
    def test_interpolate_endpoints(self, meaqr):
        a = jnp.array([0.0, 0.0])
        b = jnp.array([1.0, 0.0])
        np.testing.assert_allclose(np.asarray(meaqr.interpolate(a, b, 0.0)),
                                   np.asarray(a), atol=1e-9)
        np.testing.assert_allclose(np.asarray(meaqr.interpolate(a, b, 1.0)),
                                   np.asarray(b), atol=1e-6)

    def test_min_energy_trajectory_arcs_through_velocity(self, meaqr):
        """Rest-to-rest double-integrator transfer must pick up speed at the
        midpoint — the trajectory is a system trajectory, not a straight
        line (the whole point of the AQR topology)."""
        a = jnp.array([0.0, 0.0])
        b = jnp.array([1.0, 0.0])
        mid = meaqr.interpolate(a, b, 0.5)
        assert float(mid[1]) > 0.3  # moving forward at midpoint

    def test_distance_batched_and_finite(self, meaqr, rng):
        a = jnp.array([0.0, 0.0])
        V = jnp.asarray(rng.uniform(-2, 2, (50, 2)))
        d = meaqr.distance(a, V)
        assert d.shape == (50,)
        assert bool(jnp.all(jnp.isfinite(d))) and bool(jnp.all(d > 0))

    def test_self_distance_minimal(self, meaqr):
        """Staying put costs only the smallest admissible horizon's time
        term; any actual transfer costs strictly more."""
        a = jnp.array([0.4, 0.0])  # rest point: A·a = 0, no drift to fight
        b = jnp.array([1.0, 0.5])
        d_self = float(meaqr.distance(a, a))
        assert d_self < float(meaqr.distance(a, b))
        # equals sqrt(time_weight * smallest grid horizon) up to tiny energy
        t1 = float(meaqr.times[1])
        assert d_self == pytest.approx((0.1 * t1) ** 0.5, rel=1e-3)

    @pytest.mark.slow
    def test_rrt_over_meaqr_plans_kinodynamically(self, meaqr):
        """Kinodynamic RRT through a velocity-gated wall: steering follows
        min-energy system trajectories (ref: MEAQR planners,
        MEAQR_rrtstar_planner.hpp:78)."""
        from reak_tpu.planning.rrt import rrt_plan

        def is_free(pts):
            return ~((jnp.abs(pts[:, 0] - 0.5) < 0.15)
                     & (pts[:, 1] > -0.5) & (pts[:, 1] < 2.0))

        ws = AQRWorkspace(meaqr, is_free, n_checks=8)
        q = PlanningQuery(np.array([0.0, 0.0]), np.array([1.5, 0.0]),
                          goal_tolerance=0.5)
        res = rrt_plan(ws, q, max_iters=60, step_size=1.0, goal_bias=0.2,
                       seed=0)
        assert res.success
        assert bool(jnp.all(is_free(jnp.asarray(res.path))))

    def test_rrt_star_wrapper_smoke(self, meaqr):
        def is_free(pts):
            return jnp.ones(pts.shape[0], bool)

        q = PlanningQuery(np.array([0.0, 0.0]), np.array([0.8, 0.0]),
                          goal_tolerance=0.6)
        res = meaqr_rrt_star_plan(meaqr, is_free, q, max_iters=15,
                                  step_size=1.0, seed=1, capacity=256)
        assert res.n_vertices > 1  # ran; success depends on budget


class TestIHAQR:
    def test_metric_is_lqr_cost_to_go(self, ihaqr):
        d = jnp.array([1.0, 0.5])
        expect = float(jnp.sqrt(d @ ihaqr.P @ d))
        got = float(ihaqr.distance(jnp.zeros(2), d))
        assert abs(got - expect) < 1e-12

    def test_closed_loop_flow_converges(self, ihaqr):
        a = jnp.array([2.0, 0.0])
        b = jnp.array([-1.0, 0.0])
        x1 = ihaqr.interpolate(a, b, 1.0)
        assert float(jnp.linalg.norm(x1 - b)) < 0.05
        x0 = ihaqr.interpolate(a, b, 0.0)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(a), atol=1e-12)

    def test_flow_monotone_approach(self, ihaqr):
        a = jnp.array([2.0, 0.0])
        b = jnp.array([-1.0, 0.0])
        ds = [float(ihaqr.distance(ihaqr.interpolate(a, b, t), b))
              for t in (0.0, 0.3, 0.6, 1.0)]
        assert ds[0] > ds[1] > ds[2] > ds[3]

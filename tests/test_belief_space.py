"""Gaussian belief-space topology (ref: gaussian_belief_space.hpp:64,
covar_topology.hpp) — beliefs as planner-consumable metric-space points."""
import jax
import jax.numpy as jnp
import numpy as np

from reak_tpu.spaces.belief import GaussianBeliefSpace
from reak_tpu.ctrl.belief import GaussianBelief
from reak_tpu.planning.workspace import Workspace
from reak_tpu.planning import rrt_plan
from reak_tpu.planning.queries import PlanningQuery


def _space():
    return GaussianBeliefSpace(jnp.zeros(2), jnp.full(2, 10.0),
                               sigma_range=(0.1, 1.0))


def test_pack_unpack_roundtrip_and_psd():
    sp = _space()
    pts = sp.sample(jax.random.PRNGKey(0), (16,))
    assert pts.shape == (16, sp.dim)
    b = sp.unpack(pts)
    ev = np.linalg.eigvalsh(np.asarray(b.cov))
    assert np.all(ev > 0), "unpacked covariances must be PD"
    np.testing.assert_allclose(np.asarray(sp.pack(b)), np.asarray(pts),
                               atol=1e-6)


def test_metric_properties():
    sp = _space()
    pts = sp.sample(jax.random.PRNGKey(1), (8,))
    d = np.asarray(sp.distance(pts[:7], pts[1:]))
    assert np.all(np.isfinite(d)) and np.all(d > 0)
    # identity + symmetry (symmetrized KL)
    assert float(sp.distance(pts[0], pts[0])) < 1e-5
    d_ab = float(sp.distance(pts[0], pts[1]))
    d_ba = float(sp.distance(pts[1], pts[0]))
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)


def test_interpolation_stays_psd():
    sp = _space()
    a = sp.pack(GaussianBelief(jnp.array([1.0, 1.0]), 0.04 * jnp.eye(2)))
    b = sp.pack(GaussianBelief(jnp.array([9.0, 9.0]),
                               jnp.array([[1.0, 0.6], [0.6, 1.0]])))
    for t in (0.0, 0.25, 0.5, 0.75, 1.0):
        bel = sp.unpack(sp.interpolate(a, b, t))
        assert np.all(np.linalg.eigvalsh(np.asarray(bel.cov)) > 0)


def test_rrt_over_beliefs():
    """Plan a short belief-space path where validity caps the uncertainty
    (the planner-over-beliefs composition gaussian_belief_space.hpp enables)."""
    sp = _space()

    def is_free(x):
        bel = sp.unpack(x)
        return jnp.trace(bel.cov, axis1=-2, axis2=-1) < 1.5

    ws = Workspace(sp, is_free, n_checks=8)
    start = sp.pack(GaussianBelief(jnp.array([1.0, 1.0]), 0.04 * jnp.eye(2)))
    goal = sp.pack(GaussianBelief(jnp.array([9.0, 9.0]), 0.04 * jnp.eye(2)))
    res = rrt_plan(ws, PlanningQuery(np.asarray(start), np.asarray(goal),
                                     goal_tolerance=2.0),
                   max_iters=40, step_size=3.0, seed=0)
    assert res.success
    # every path point is a valid (PD, capped-uncertainty) belief
    path = jnp.asarray(res.path)
    assert bool(jnp.all(is_free(path)))

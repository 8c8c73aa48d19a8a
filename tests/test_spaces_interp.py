"""Spaces and interpolation tests (parity model: ref test_interp.cpp,
test_Ndof_interp.cpp, topologies/test_sampling.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

import reak_tpu.spaces as sp
import reak_tpu.interp as ip


def test_hyperbox(rng):
    box = sp.HyperboxSpace(jnp.array([-1.0, 0.0]), jnp.array([1.0, 2.0]))
    key = jax.random.PRNGKey(0)
    p = box.sample(key, (100,))
    assert bool(box.contains(p).all())
    np.testing.assert_allclose(box.distance(p, p), 0.0, atol=1e-12)
    mid = box.interpolate(p[0], p[1], 0.5)
    np.testing.assert_allclose(mid, 0.5 * (p[0] + p[1]), atol=1e-12)
    out = box.clamp(jnp.array([5.0, -3.0]))
    np.testing.assert_allclose(out, [1.0, 0.0])


def test_hyperball(rng):
    ball = sp.HyperballSpace(jnp.zeros(3), 2.0)
    key = jax.random.PRNGKey(1)
    p = ball.sample(key, (500,))
    assert float(jnp.max(jnp.linalg.norm(p, axis=-1))) <= 2.0 + 1e-9
    clamped = ball.clamp(jnp.array([10.0, 0.0, 0.0]))
    np.testing.assert_allclose(clamped, [2.0, 0.0, 0.0], atol=1e-9)


def test_so3_space(rng):
    so3 = sp.SO3Space()
    key = jax.random.PRNGKey(2)
    q = so3.sample(key, (200,))
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-9)
    # distance symmetric, zero on diagonal, triangle-ish
    d = so3.distance(q[:10], q[10:20])
    d2 = so3.distance(q[10:20], q[:10])
    np.testing.assert_allclose(d, d2, atol=1e-9)
    np.testing.assert_allclose(so3.distance(q, q), 0.0, atol=1e-6)


def test_temporal_space(rng):
    box = sp.HyperboxSpace(jnp.zeros(2), jnp.ones(2))
    tsp = sp.TemporalSpace(box, 10.0, max_speed=0.5)
    a = sp.temporal.TemporalPoint(jnp.asarray(1.0), jnp.array([0.0, 0.0]))
    b_ok = sp.temporal.TemporalPoint(jnp.asarray(3.0), jnp.array([0.5, 0.0]))
    b_fast = sp.temporal.TemporalPoint(jnp.asarray(1.2), jnp.array([1.0, 1.0]))
    b_past = sp.temporal.TemporalPoint(jnp.asarray(0.5), jnp.array([0.1, 0.0]))
    assert np.isfinite(float(tsp.distance(a, b_ok)))
    assert np.isinf(float(tsp.distance(a, b_fast)))  # unreachable at max_speed
    assert np.isinf(float(tsp.distance(a, b_past)))  # backward in time


def test_rate_limited_space():
    lim = sp.rate_limited.JointLimits(
        lower=jnp.array([-1.0, -2.0]),
        upper=jnp.array([1.0, 2.0]),
        speed=jnp.array([2.0, 4.0]),
    )
    rls = sp.RateLimitedNdofSpace(lim)
    # distance is travel time: moving joint 0 by 1 rad at 2 rad/s = 0.5 s
    a = rls.from_natural(jnp.array([0.0, 0.0]))
    b = rls.from_natural(jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(rls.distance(a, b), 0.5, atol=1e-12)
    np.testing.assert_allclose(rls.to_natural(b), [1.0, 0.0], atol=1e-12)


def test_product_space(rng):
    s1 = sp.HyperboxSpace(jnp.zeros(2), jnp.ones(2))
    s2 = sp.SO3Space()
    prod = sp.ProductSpace([s1, s2], weights=[1.0, 0.5])
    key = jax.random.PRNGKey(3)
    a = prod.sample(key, (4,))
    b = prod.sample(jax.random.PRNGKey(4), (4,))
    d = prod.distance(a, b)
    assert d.shape == (4,)
    mid = prod.interpolate(a, b, 0.5)
    assert mid[0].shape == (4, 2) and mid[1].shape == (4, 4)


# ---------------------------------------------------------------------------
# interpolators
# ---------------------------------------------------------------------------


def test_cubic_hermite_endpoints(rng):
    p0, v0 = jnp.array([0.0, 1.0]), jnp.array([1.0, 0.0])
    p1, v1 = jnp.array([2.0, -1.0]), jnp.array([0.0, 2.0])
    dt = 2.0
    pos0, vel0, _ = ip.cubic_hermite_interp(p0, v0, p1, v1, 0.0, dt)
    pos1, vel1, _ = ip.cubic_hermite_interp(p0, v0, p1, v1, 1.0, dt)
    np.testing.assert_allclose(pos0, p0, atol=1e-12)
    np.testing.assert_allclose(vel0, v0, atol=1e-12)
    np.testing.assert_allclose(pos1, p1, atol=1e-12)
    np.testing.assert_allclose(vel1, v1, atol=1e-12)


def test_quintic_hermite_endpoints(rng):
    arrs = [jnp.asarray(rng.standard_normal(3)) for _ in range(6)]
    p0, v0, a0, p1, v1, a1 = arrs
    dt = 1.5
    for t, (pr, vr, ar) in [(0.0, (p0, v0, a0)), (1.0, (p1, v1, a1))]:
        pos, vel, acc = ip.quintic_hermite_interp(p0, v0, a0, p1, v1, a1, t, dt)
        np.testing.assert_allclose(pos, pr, atol=1e-9)
        np.testing.assert_allclose(vel, vr, atol=1e-9)
        np.testing.assert_allclose(acc, ar, atol=1e-8)


def test_quintic_derivative_consistency(rng):
    arrs = [jnp.asarray(rng.standard_normal(2)) for _ in range(6)]
    p0, v0, a0, p1, v1, a1 = arrs
    dt, eps = 1.0, 1e-6
    for t in [0.25, 0.6]:
        pos_p, _, _ = ip.quintic_hermite_interp(p0, v0, a0, p1, v1, a1, t + eps, dt)
        pos_m, _, _ = ip.quintic_hermite_interp(p0, v0, a0, p1, v1, a1, t - eps, dt)
        _, vel, _ = ip.quintic_hermite_interp(p0, v0, a0, p1, v1, a1, t, dt)
        np.testing.assert_allclose((pos_p - pos_m) / (2 * eps * dt), vel, atol=1e-4)


def test_sap_profile(rng):
    # synchronized rest-to-rest S-curve: endpoints exact, limits respected
    p0 = jnp.array([0.0, 0.0])
    p1 = jnp.array([2.0, -0.5])
    v_max = jnp.array([1.0, 1.0])
    a_max = jnp.array([2.0, 2.0])
    v0 = jnp.zeros(2)
    pos, vel, acc, T = ip.sap_interpolate(p0, v0, p1, v0, v_max, a_max, 0.0)
    np.testing.assert_allclose(pos, p0, atol=1e-9)
    posT, velT, _, _ = ip.sap_interpolate(p0, v0, p1, v0, v_max, a_max, T)
    np.testing.assert_allclose(posT, p1, atol=5e-3)
    np.testing.assert_allclose(velT, 0.0, atol=1e-6)
    ts = jnp.linspace(0.0, float(T), 101)[:, None]
    pos_s, vel_s, _, _ = ip.sap_interpolate(p0, v0, p1, v0, v_max, a_max, ts)
    assert float(jnp.max(jnp.abs(vel_s))) <= 1.0 + 1e-6
    assert bool(jnp.all(jnp.diff(pos_s[:, 0]) >= -1e-9))  # joint 0 monotone


def test_svp(rng):
    # rest-to-rest with ramps: joint 1 moves 1 rad at vmax=0.5 (a_ramp=vmax)
    p0, p1 = jnp.array([0.0, 1.0]), jnp.array([1.0, 0.0])
    v_max = jnp.array([2.0, 0.5])
    v0 = jnp.zeros(2)
    T_j, vp = ip.svp_min_time(p0, p1, v0, v0, v_max)
    # joint 1: ramps cover 0.5·vmax·(2·1s) = 0.5 rad, cruise 0.5/0.5 = 1 s → 3 s
    np.testing.assert_allclose(T_j[1], 3.0, atol=1e-9)
    T = jnp.max(T_j)
    pos, vel, _ = ip.svp_interpolate(p0, v0, p1, v0, v_max, 0.5 * T)
    # symmetric profile: halfway in time = halfway in distance
    np.testing.assert_allclose(pos, 0.5 * (p0 + p1), atol=1e-9)


def test_waypoint_trajectory(rng):
    times = jnp.array([0.0, 1.0, 3.0])
    pts = jnp.array([[0.0, 0.0], [1.0, 2.0], [3.0, 0.0]])
    traj = ip.waypoint_trajectory(times, pts)
    np.testing.assert_allclose(traj.eval(0.0), pts[0], atol=1e-12)
    np.testing.assert_allclose(traj.eval(1.0), pts[1], atol=1e-12)
    np.testing.assert_allclose(traj.eval(2.0), 0.5 * (pts[1] + pts[2]), atol=1e-12)
    # clamping beyond the ends
    np.testing.assert_allclose(traj.eval(99.0), pts[2], atol=1e-12)
    # batched times
    out = traj.eval(jnp.linspace(0, 3, 7))
    assert out.shape == (7, 2)


def test_cubic_trajectory_smooth(rng):
    times = jnp.array([0.0, 1.0, 2.0])
    pts = jnp.array([[0.0], [1.0], [0.0]])
    vels = jnp.array([[0.0], [0.0], [0.0]])
    traj = ip.waypoint_trajectory(times, pts, vels)
    pos, vel, acc = traj.eval_with_derivatives(jnp.asarray(0.5))
    np.testing.assert_allclose(pos[0], 0.5, atol=1e-12)  # symmetric bump
    np.testing.assert_allclose(traj.eval(1.0)[0], 1.0, atol=1e-12)


def test_transformed_trajectory(rng):
    times = jnp.array([0.0, 2.0])
    pts = jnp.array([[0.0], [2.0]])
    base = ip.waypoint_trajectory(times, pts)
    tt = ip.transformed_trajectory(base, lambda p: 3.0 * p + 1.0)
    np.testing.assert_allclose(tt.eval(1.0), [4.0], atol=1e-12)


def test_constant_trajectory():
    traj = ip.constant_trajectory(jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(traj.eval(57.0), [1.0, 2.0], atol=1e-12)


def test_interpolated_space_profiles():
    """Interp-aware topology wrapper (ref: interpolated_topologies.hpp):
    cubic/quintic easing with correct endpoints, zero boundary velocities,
    and (quintic) zero boundary accelerations."""
    from reak_tpu.spaces import HyperboxSpace, InterpolatedSpace

    base = HyperboxSpace(jnp.zeros(2), jnp.ones(2) * 4.0)
    a, b = jnp.array([0.0, 0.0]), jnp.array([4.0, 2.0])
    for profile in ("linear", "cubic", "quintic"):
        sp = InterpolatedSpace(base, profile)
        np.testing.assert_allclose(np.asarray(sp.interpolate(a, b, 0.0)), a,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(sp.interpolate(a, b, 1.0)), b,
                                   atol=1e-12)
        # delegation: metric and sampling are the base space's
        assert float(sp.distance(a, b)) == float(base.distance(a, b))
    cub = InterpolatedSpace(base, "cubic")
    np.testing.assert_allclose(np.asarray(cub.interpolate(a, b, 0.5)),
                               np.asarray(0.5 * (a + b)), atol=1e-12)
    # derivative surface: v(0)=v(1)=0 for cubic; quintic also a(0)=a(1)=0
    _, v0, _ = cub.eval_with_derivatives(a, b, 0.0, duration=2.0)
    _, v1, _ = cub.eval_with_derivatives(a, b, 1.0, duration=2.0)
    np.testing.assert_allclose(np.asarray(v0), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), 0.0, atol=1e-12)
    qui = InterpolatedSpace(base, "quintic")
    _, vm, am0 = qui.eval_with_derivatives(a, b, 0.0, duration=2.0)
    _, _, am1 = qui.eval_with_derivatives(a, b, 1.0, duration=2.0)
    np.testing.assert_allclose(np.asarray(am0), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(am1), 0.0, atol=1e-12)
    # mid-traversal velocity of the quintic: 30/16 * delta / duration
    _, vmid, _ = qui.eval_with_derivatives(a, b, 0.5, duration=2.0)
    np.testing.assert_allclose(np.asarray(vmid),
                               np.asarray(b - a) * (30.0 / 16.0) / 2.0,
                               atol=1e-12)
    import pytest as _pt
    with _pt.raises(ValueError, match="profile"):
        InterpolatedSpace(base, "septic")

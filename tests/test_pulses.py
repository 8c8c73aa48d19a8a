"""SVP/SAP min-time profile tests: endpoint exactness, limit respect,
derivative consistency, and brute-force optimality oracles.

(parity model: ref test_Ndof_interp.cpp / test_lim_interp.cpp, and the
closed-form solvers of sustained_velocity_pulse_Ndof_detail.cpp /
sustained_acceleration_pulse_Ndof_detail.cpp)
"""
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.interp import pulses as pl


def _rand_cases(rng, n, vmax=1.5):
    p0 = rng.uniform(-3, 3, n)
    p1 = rng.uniform(-3, 3, n)
    v0 = rng.uniform(-0.95, 0.95, n) * vmax
    v1 = rng.uniform(-0.95, 0.95, n) * vmax
    return map(jnp.asarray, (p0, p1, v0, v1))


def _brute_svp_min_time(p0, p1, v0, v1, vmax, a, n_grid=40001):
    """Grid-search oracle: scan peak velocities, keep feasible profiles."""
    vp = np.linspace(-vmax, vmax, n_grid)
    dt1 = np.abs(vp - v0) / a
    dp1 = 0.5 * (v0 + vp) * dt1
    dt2 = np.abs(v1 - vp) / a
    dp2 = 0.5 * (vp + v1) * dt2
    rem = (p1 - p0) - dp1 - dp2
    with np.errstate(divide="ignore", invalid="ignore"):
        tc = rem / vp
    feas = np.where(np.abs(vp) < 1e-12, np.abs(rem) < 1e-9, tc > -1e-12)
    T = dt1 + dt2 + np.maximum(tc, 0.0)
    T = np.where(feas, T, np.inf)
    return T.min()


class TestSVP:
    def test_rest_to_rest_triangle(self):
        # distance 1 at vmax=1, ramp rate 1: triangular profile, T = 2
        T, vp = pl.svp_min_time(0.0, 1.0, 0.0, 0.0, 1.0, a_ramp=1.0)
        np.testing.assert_allclose(T, 2.0, atol=1e-12)
        np.testing.assert_allclose(vp, 1.0, atol=1e-12)

    def test_rest_to_rest_trapezoid(self):
        # distance 3 at vmax=1, ramp rate 1: ramps cover 1, cruise 2 → T = 4
        T, vp = pl.svp_min_time(0.0, 3.0, 0.0, 0.0, 1.0, a_ramp=1.0)
        np.testing.assert_allclose(T, 4.0, atol=1e-12)
        np.testing.assert_allclose(vp, 1.0, atol=1e-12)

    def test_min_time_vs_bruteforce(self, rng):
        vmax, a = 1.5, 2.0
        p0, p1, v0, v1 = _rand_cases(rng, 64, vmax)
        T, _ = pl.svp_min_time(p0, p1, v0, v1, vmax, a)
        for i in range(64):
            T_ref = _brute_svp_min_time(
                float(p0[i]), float(p1[i]), float(v0[i]), float(v1[i]), vmax, a
            )
            assert abs(float(T[i]) - T_ref) < 2e-3, (
                i, float(p0[i]), float(p1[i]), float(v0[i]), float(v1[i]),
                float(T[i]), T_ref,
            )

    def test_eval_endpoints_and_limits(self, rng):
        vmax, a = 1.5, 2.0
        p0, p1, v0, v1 = _rand_cases(rng, 128, vmax)
        T, vp = pl.svp_min_time(p0, p1, v0, v1, vmax, a)
        pos0, vel0, _ = pl.svp_eval(p0, p1, v0, v1, vp, vmax, T, 0.0, a)
        np.testing.assert_allclose(pos0, p0, atol=1e-9)
        np.testing.assert_allclose(vel0, v0, atol=1e-9)
        posT, velT, _ = pl.svp_eval(p0, p1, v0, v1, vp, vmax, T, T, a)
        np.testing.assert_allclose(posT, p1, atol=1e-7)
        np.testing.assert_allclose(velT, v1, atol=1e-9)
        # dense sweep: velocity limit + pos/vel consistency
        ts = jnp.linspace(0.0, 1.0, 257)[:, None] * T[None, :]
        pos, vel, _ = pl.svp_eval(p0, p1, v0, v1, vp, vmax, T, ts, a)
        assert float(jnp.max(jnp.abs(vel))) <= vmax + 1e-6
        dt_c = (T / 256.0)[None, :]
        mid_vel = 0.5 * (vel[1:] + vel[:-1])
        np.testing.assert_allclose(
            (pos[1:] - pos[:-1]) / dt_c, mid_vel, atol=2e-2
        )

    def test_stretched_duration(self, rng):
        vmax, a = 1.0, 1.0
        p0, p1, v0, v1 = _rand_cases(rng, 64, vmax)
        T_min, _ = pl.svp_min_time(p0, p1, v0, v1, vmax, a)
        T = 1.5 * T_min + 0.3
        vp = pl.svp_peak_velocity(p0, p1, v0, v1, vmax, T, a)
        assert float(jnp.max(jnp.abs(vp))) <= vmax * 1.001 + 1e-9
        posT, velT, _ = pl.svp_eval(p0, p1, v0, v1, vp, vmax, T, T, a)
        np.testing.assert_allclose(posT, p1, atol=1e-6)
        np.testing.assert_allclose(velT, v1, atol=1e-9)

    def test_peak_velocity_at_min_time_matches(self, rng):
        vmax, a = 1.2, 0.8
        p0, p1, v0, v1 = _rand_cases(rng, 64, vmax)
        T, vp_min = pl.svp_min_time(p0, p1, v0, v1, vmax, a)
        vp = pl.svp_peak_velocity(p0, p1, v0, v1, vmax, T, a)
        posT, velT, _ = pl.svp_eval(p0, p1, v0, v1, vp, vmax, T, T, a)
        np.testing.assert_allclose(posT, p1, atol=1e-6)
        np.testing.assert_allclose(velT, v1, atol=1e-8)

    def test_ndof_synchronized(self, rng):
        vmax = jnp.array([1.0, 2.0, 0.5])
        p0 = jnp.array([0.0, 0.0, 0.0])
        p1 = jnp.array([1.0, -2.0, 0.25])
        v0 = jnp.zeros(3)
        v1 = jnp.zeros(3)
        pos, vel, T = pl.svp_interpolate(p0, v0, p1, v1, vmax, 0.0)
        np.testing.assert_allclose(pos, p0, atol=1e-9)
        posT, velT, _ = pl.svp_interpolate(p0, v0, p1, v1, vmax, T)
        np.testing.assert_allclose(posT, p1, atol=1e-6)
        np.testing.assert_allclose(velT, v1, atol=1e-8)

    def test_reach_time_metric(self):
        # moving joint 1 dominates: Δ=2 at vmax=0.5, ramp=vmax → trapezoid
        p0 = jnp.array([0.0, 0.0])
        p1 = jnp.array([0.1, 2.0])
        v = jnp.zeros(2)
        t = pl.svp_reach_time(p0, v, p1, v, jnp.array([1.0, 0.5]))
        t1, _ = pl.svp_min_time(0.0, 2.0, 0.0, 0.0, 0.5)
        np.testing.assert_allclose(t, t1, atol=1e-12)


def _brute_sap_min_time(p0, p1, v0, v1, vmax, amax, j, n_grid=40001):
    vp = np.linspace(-vmax, vmax, n_grid)

    def ramp(v1_, v2_):
        dv = np.abs(v2_ - v1_)
        dt = np.where(dv >= amax * amax / j, dv / amax + amax / j,
                      2.0 * np.sqrt(dv / j))
        return 0.5 * (v1_ + v2_) * dt, dt

    dp1, dt1 = ramp(v0, vp)
    dp2, dt2 = ramp(vp, v1)
    rem = (p1 - p0) - dp1 - dp2
    with np.errstate(divide="ignore", invalid="ignore"):
        tc = rem / vp
    feas = np.where(np.abs(vp) < 1e-12, np.abs(rem) < 1e-9, tc > -1e-12)
    T = np.where(feas, dt1 + dt2 + np.maximum(tc, 0.0), np.inf)
    return T.min()


class TestSAP:
    def test_rest_to_rest_known(self):
        # Δ=2, vmax=1, amax=2, jmax=2: ramp 0→1 has Δv=1 < amax²/j=2 →
        # triangular accel, dt_ramp = 2√(1/2), dp_ramp = √(1/2)/2·... use oracle
        T, vp = pl.sap_min_time(0.0, 2.0, 0.0, 0.0, 1.0, 2.0, 2.0)
        T_ref = _brute_sap_min_time(0.0, 2.0, 0.0, 0.0, 1.0, 2.0, 2.0)
        np.testing.assert_allclose(float(T), T_ref, atol=1e-6)

    def test_min_time_vs_bruteforce(self, rng):
        vmax, amax, j = 1.5, 2.0, 3.0
        p0, p1, v0, v1 = _rand_cases(rng, 48, vmax)
        T, _ = pl.sap_min_time(p0, p1, v0, v1, vmax, amax, j)
        for i in range(48):
            T_ref = _brute_sap_min_time(
                float(p0[i]), float(p1[i]), float(v0[i]), float(v1[i]),
                vmax, amax, j,
            )
            assert abs(float(T[i]) - T_ref) < 2e-3

    @pytest.mark.slow  # compile-heavy on XLA-CPU; covered by cheaper siblings in the default run
    def test_eval_endpoints_limits_continuity(self, rng):
        vmax, amax, j = 1.5, 2.0, 3.0
        p0, p1, v0, v1 = _rand_cases(rng, 96, vmax)
        T, vp = pl.sap_min_time(p0, p1, v0, v1, vmax, amax, j)
        pos0, vel0, acc0, _ = pl.sap_eval(p0, p1, v0, v1, vp, vmax, amax, T, 0.0, j)
        np.testing.assert_allclose(pos0, p0, atol=1e-9)
        np.testing.assert_allclose(vel0, v0, atol=1e-9)
        posT, velT, accT, _ = pl.sap_eval(p0, p1, v0, v1, vp, vmax, amax, T, T, j)
        np.testing.assert_allclose(posT, p1, atol=1e-6)
        np.testing.assert_allclose(velT, v1, atol=1e-7)
        ts = jnp.linspace(0.0, 1.0, 513)[:, None] * T[None, :]
        pos, vel, acc, _ = pl.sap_eval(p0, p1, v0, v1, vp, vmax, amax, T, ts, j)
        assert float(jnp.max(jnp.abs(vel))) <= vmax + 1e-6
        assert float(jnp.max(jnp.abs(acc))) <= amax + 1e-6
        # velocity is the derivative of position
        dt_c = (T / 512.0)[None, :]
        mid_vel = 0.5 * (vel[1:] + vel[:-1])
        np.testing.assert_allclose((pos[1:] - pos[:-1]) / dt_c, mid_vel, atol=2e-2)
        # acceleration is the derivative of velocity (S-curve: continuous accel)
        mid_acc = 0.5 * (acc[1:] + acc[:-1])
        dv = (vel[1:] - vel[:-1]) / dt_c
        np.testing.assert_allclose(dv, mid_acc, atol=5e-2)

    def test_stretched_duration(self, rng):
        vmax, amax = 1.0, 1.5
        p0, p1, v0, v1 = _rand_cases(rng, 48, vmax)
        T_min, _ = pl.sap_min_time(p0, p1, v0, v1, vmax, amax)
        T = 1.4 * T_min + 0.5
        vp = pl.sap_peak_velocity(p0, p1, v0, v1, vmax, amax, T)
        posT, velT, _, _ = pl.sap_eval(p0, p1, v0, v1, vp, vmax, amax, T, T)
        np.testing.assert_allclose(posT, p1, atol=5e-3)
        np.testing.assert_allclose(velT, v1, atol=1e-7)

    def test_ndof_synchronized(self):
        vmax = jnp.array([1.0, 0.5])
        amax = jnp.array([2.0, 2.0])
        p0 = jnp.zeros(2)
        p1 = jnp.array([0.3, 1.5])
        v = jnp.zeros(2)
        pos, vel, acc, T = pl.sap_interpolate(p0, v, p1, v, vmax, amax, 0.0)
        np.testing.assert_allclose(pos, p0, atol=1e-9)
        posT, velT, _, _ = pl.sap_interpolate(p0, v, p1, v, vmax, amax, T)
        np.testing.assert_allclose(posT, p1, atol=5e-3)
        np.testing.assert_allclose(velT, v, atol=1e-7)


def test_svp_timed_stretch_endpoint_consistency_near_boundaries(rng):
    """Minimal-violation root selection (r3 fix of the r2 1e-3·vmax
    tolerance): stretched profiles must land exactly on (p1, v1) at T,
    including stretches within ~1e-6 of the min-time regime boundary."""
    import jax.numpy as jnp
    from reak_tpu.interp import pulses as pl

    vmax, a = 1.3, 2.1
    p0 = jnp.asarray(rng.uniform(-1, 1, 256))
    p1 = jnp.asarray(rng.uniform(-1, 1, 256))
    v0 = jnp.asarray(rng.uniform(-0.9 * vmax, 0.9 * vmax, 256))
    v1 = jnp.asarray(rng.uniform(-0.9 * vmax, 0.9 * vmax, 256))
    Tmin, _ = pl.svp_min_time(p0, p1, v0, v1, vmax, a)
    # stretches within every instance's single-pulse feasibility window
    # (large stretches with same-sign boundary velocities and tiny
    # displacement have no single-peak profile at all — a structural SVP
    # property, not a solver tolerance; the r2 issue was accuracy NEAR the
    # min-time regime boundary, which these factors bracket)
    for stretch in (1.0 + 1e-6, 1.0001, 1.001, 1.01, 1.2):
        T = Tmin * stretch + 1e-9
        vp = pl.svp_peak_velocity(p0, p1, v0, v1, vmax, T, a)
        pos, vel, _ = pl.svp_eval(p0, p1, v0, v1, vp, vmax, T, T, a)
        np.testing.assert_allclose(np.asarray(pos), np.asarray(p1),
                                   atol=5e-7, err_msg=f"stretch={stretch}")
        np.testing.assert_allclose(np.asarray(vel), np.asarray(v1),
                                   atol=5e-7, err_msg=f"stretch={stretch}")

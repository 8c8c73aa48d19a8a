"""Stiff IVP parity suite — the published CWI/Hairer-Wanner endpoints the
reference encodes as fixtures (unit_test_integrators_problems.hpp:53-348)
but never asserts against (its test cases are empty shells and it has no
L-stable solver).  Here every problem is integrated to its final time and
checked against the published reference solution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.integrators import ivp_suite as ivs
from reak_tpu.integrators.adaptive import integrate_adaptive
from reak_tpu.integrators.implicit import integrate_rosenbrock
from reak_tpu.integrators.multistep import adams_bm5, hamming_iter_mod


def _endpoint_rel_err(y, ref):
    m = ~np.isnan(ref)
    return np.max(np.abs(np.asarray(y)[m] - ref[m])
                  / (np.abs(ref[m]) + 1e-30))


# (problem, dt0, rtol, atol, max_steps, rel_err bar) — bars set ~5-10x the
# measured solver error at these tolerances
ROSENBROCK_CASES = [
    (ivs.HIRES, 1e-6, 1e-7, 1e-12, 100_000, 1e-5),
    (ivs.POLLU, 1e-6, 1e-7, 1e-12, 100_000, 1e-5),
    (ivs.OREGO, 1e-6, 1e-7, 1e-12, 200_000, 5e-4),
    (ivs.ROBER, 1e-6, 1e-7, 1e-14, 200_000, 2e-3),
    (ivs.VDP, 1e-8, 1e-7, 1e-12, 200_000, 5e-5),
    (ivs.VDP_MOD, 1e-6, 1e-7, 1e-12, 200_000, 5e-5),
]


@pytest.mark.parametrize(
    "prob,dt0,rtol,atol,max_steps,bar", ROSENBROCK_CASES,
    ids=[c[0].name for c in ROSENBROCK_CASES])
def test_rosenbrock_hits_published_endpoint(prob, dt0, rtol, atol,
                                            max_steps, bar):
    res = jax.jit(lambda y0: integrate_rosenbrock(
        prob.f, y0, prob.t0, prob.tf, dt0=dt0, rtol=rtol, atol=atol,
        max_steps=max_steps))(jnp.asarray(prob.y0))
    assert bool(res.ok), f"{prob.name}: integration did not reach tf"
    assert _endpoint_rel_err(res.y, prob.y_ref) < bar


def test_rosenbrock_medakzo_400_states():
    """The 400-state reaction-diffusion MEDAKZO problem: endpoint parity on
    the 15 leading u-cells + reaction-front tail of the published data."""
    prob = ivs.MEDAKZO
    res = jax.jit(lambda y0: integrate_rosenbrock(
        prob.f, y0, prob.t0, prob.tf, dt0=1e-8, rtol=1e-6, atol=1e-12,
        max_steps=200_000))(jnp.asarray(prob.y0))
    assert bool(res.ok)
    y = np.asarray(res.y)
    ref = prob.y_ref
    lead = slice(0, 30, 2)
    rel = np.max(np.abs(y[lead] - ref[lead]) / np.abs(ref[lead]))
    assert rel < 2e-3
    # far-field cells: reaction never arrives (v stays 1, u stays ~0)
    np.testing.assert_allclose(y[391:400:2], 1.0, atol=1e-8)
    assert np.max(np.abs(y[390:400:2])) < 1e-8


@pytest.mark.slow
def test_rosenbrock_ring_modulator():
    """RINGMOD (C_s = 2e-12): λ ~ 1e12 with a 20 kHz drive — ~2M Rosenbrock
    steps; far beyond any reference integrator (slow-marked)."""
    prob = ivs.RINGMOD
    res = jax.jit(lambda y0: integrate_rosenbrock(
        prob.f, y0, prob.t0, prob.tf, dt0=1e-10, rtol=1e-7, atol=1e-12,
        max_steps=3_000_000))(jnp.asarray(prob.y0))
    assert bool(res.ok)
    assert _endpoint_rel_err(res.y, prob.y_ref) < 5e-3


def test_dopri45_hits_hires_endpoint():
    """The mildly stiff HIRES is traversable by the explicit adaptive DP45
    (the reference's best integrator) — endpoint parity to the published
    values, and cross-solver agreement with Rosenbrock."""
    prob = ivs.HIRES
    res = jax.jit(lambda y0: integrate_adaptive(
        prob.f, y0, prob.t0, prob.tf, dt0=1e-4, tol=1e-10,
        dt_min=1e-12, max_steps=2_000_000, method="dopri45"))(
            jnp.asarray(prob.y0))
    assert bool(res.ok)
    assert _endpoint_rel_err(res.y, prob.y_ref) < 1e-4


def test_multistep_hits_hires_endpoint():
    """Adams-Bashforth-Moulton 5 and iterated Hamming at a stability-bounded
    fixed step also traverse HIRES (predictor-corrector parity,
    ref: pred_corr_integrators.hpp:301,821)."""
    prob = ivs.HIRES
    n = 400_000
    dt = (prob.tf - prob.t0) / n
    y_ab = jax.jit(lambda y0: adams_bm5(prob.f, y0, prob.t0, dt, n))(
        jnp.asarray(prob.y0))
    assert _endpoint_rel_err(y_ab, prob.y_ref) < 1e-5
    y_hm = jax.jit(lambda y0: hamming_iter_mod(prob.f, y0, prob.t0, dt, n))(
        jnp.asarray(prob.y0))
    assert _endpoint_rel_err(y_hm, prob.y_ref) < 1e-5


def test_rosenbrock_mass_action_conservation():
    """ROBER conserves total mass exactly in the model; the solver must
    preserve it to solver tolerance over t ∈ [0, 1e11]."""
    prob = ivs.ROBER
    res = jax.jit(lambda y0: integrate_rosenbrock(
        prob.f, y0, prob.t0, prob.tf, dt0=1e-6, rtol=1e-7, atol=1e-14,
        max_steps=200_000))(jnp.asarray(prob.y0))
    assert bool(res.ok)
    assert abs(float(jnp.sum(res.y)) - 1.0) < 1e-7

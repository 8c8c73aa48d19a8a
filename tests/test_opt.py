"""Optimization & root-finder tests (ref test strategy: core/optimization
test_{lp,qp,nllsq,nlp}.cpp manual programs + root_finders unit tests, made
assertive here per SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu import opt


# ---------------------------------------------------------------- roots
def test_bisection_batched():
    f = lambda x: jnp.cos(x) - x
    roots = opt.bisection(f, jnp.zeros(3), jnp.ones(3) * 1.5)
    np.testing.assert_allclose(np.asarray(roots), 0.7390851332, atol=1e-9)


def test_secant_and_illinois():
    f = lambda x: x**3 - 2 * x - 5.0  # root ≈ 2.0945514815
    r1 = opt.secant(f, jnp.asarray(2.0), jnp.asarray(3.0))
    r2 = opt.illinois(f, jnp.asarray(1.0), jnp.asarray(3.0))
    np.testing.assert_allclose(float(r1), 2.0945514815, atol=1e-8)
    np.testing.assert_allclose(float(r2), 2.0945514815, atol=1e-8)


def test_ridders_brent():
    f = lambda x: jnp.exp(x) - 2.0
    r1 = opt.ridders(f, jnp.asarray(0.0), jnp.asarray(2.0))
    r2 = opt.brent(f, jnp.asarray(0.0), jnp.asarray(2.0))
    np.testing.assert_allclose(float(r1), np.log(2.0), atol=1e-8)
    np.testing.assert_allclose(float(r2), np.log(2.0), atol=1e-6)


def test_newton_raphson_ad_derivative():
    f = lambda x: x * x - 2.0
    r = opt.newton_raphson(f, jnp.asarray(1.0))
    np.testing.assert_allclose(float(r), np.sqrt(2.0), rtol=1e-12)


def test_broyden_2d_system():
    def f(x):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 4.0, x[0] - x[1]])
    r = opt.broyden(f, jnp.array([1.0, 2.0]), iters=60)
    np.testing.assert_allclose(np.asarray(r), np.sqrt(2.0), atol=1e-7)


# ---------------------------------------------------------------- line search
def test_golden_section_batched():
    f = lambda x: (x - 1.3) ** 2
    xm = opt.golden_section(f, jnp.zeros(4), jnp.full(4, 3.0))
    np.testing.assert_allclose(np.asarray(xm), 1.3, atol=1e-7)


def test_dichotomous():
    f = lambda x: jnp.abs(x - 0.25)
    xm = opt.dichotomous_search(f, jnp.asarray(-1.0), jnp.asarray(1.0))
    np.testing.assert_allclose(float(xm), 0.25, atol=1e-5)


def test_wolfe_zoom_quadratic():
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    fg = lambda x: (f(x), jax.grad(f)(x))
    x = jnp.zeros(2)
    g = jax.grad(f)(x)
    a, fn = opt.wolfe_zoom(fg, x, -g, f(x), g)
    assert float(fn) < float(f(x))


# ---------------------------------------------------------------- NLLSQ
def _expfit_residual(params, t, y):
    a, b = params
    return a * jnp.exp(b * t) - y


def test_levenberg_marquardt_curve_fit():
    t = jnp.linspace(0, 1, 25)
    y = 2.0 * jnp.exp(-1.5 * t)
    r = lambda p: _expfit_residual(p, t, y)
    res = opt.levenberg_marquardt(r, jnp.array([1.0, 0.0]), iters=40)
    np.testing.assert_allclose(np.asarray(res.x), [2.0, -1.5], atol=1e-6)
    assert float(res.residual_norm) < 1e-7


def test_gauss_newton_matches_lm():
    t = jnp.linspace(0, 1, 25)
    y = 2.0 * jnp.exp(-1.5 * t)
    r = lambda p: _expfit_residual(p, t, y)
    res = opt.gauss_newton(r, jnp.array([1.5, -1.0]), iters=25)
    np.testing.assert_allclose(np.asarray(res.x), [2.0, -1.5], atol=1e-6)


def test_jacobian_transpose_descends():
    r = lambda p: jnp.array([p[0] - 1.0, 2.0 * (p[1] + 0.5)])
    res = opt.jacobian_transpose(r, jnp.zeros(2), iters=300)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, -0.5], atol=1e-4)


def test_lm_vmaps_over_batches():
    t = jnp.linspace(0, 1, 20)
    bs = jnp.array([-0.5, -1.0, -2.0])
    ys = 1.0 * jnp.exp(bs[:, None] * t[None, :])

    def solve(y):
        return opt.levenberg_marquardt(
            lambda p: _expfit_residual(p, t, y), jnp.array([0.8, -0.1]),
            iters=40).x

    xs = jax.vmap(solve)(ys)
    np.testing.assert_allclose(np.asarray(xs[:, 1]), np.asarray(bs), atol=1e-5)


# ---------------------------------------------------------------- NLP
def _rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


@pytest.mark.parametrize("solver,kw", [
    (opt.bfgs, dict(iters=120)),
    (opt.nonlinear_cg, dict(iters=400, variant="fr")),
    (opt.nonlinear_cg, dict(iters=1600, variant="pr")),
    (opt.newton_method, dict(iters=60)),
    (opt.sr1_trust_region, dict(iters=200)),
])
def test_rosenbrock_2d(solver, kw):
    res = solver(_rosenbrock, jnp.array([-1.2, 1.0]), **kw)
    np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=2e-3)


def test_nelder_mead_quadratic():
    f = lambda x: jnp.sum((x - jnp.array([0.3, -0.7, 1.1])) ** 2)
    res = opt.nelder_mead(f, jnp.zeros(3), iters=300)
    np.testing.assert_allclose(np.asarray(res.x), [0.3, -0.7, 1.1], atol=1e-4)


# ---------------------------------------------------------------- constrained
def test_augmented_lagrangian_equality():
    f = lambda x: jnp.sum(x**2)
    ce = lambda x: jnp.array([x[0] + x[1] - 1.0])
    res = opt.augmented_lagrangian(f, jnp.zeros(2), ce=ce)
    np.testing.assert_allclose(np.asarray(res.x), 0.5, atol=1e-5)
    assert float(res.eq_violation) < 1e-6


def test_augmented_lagrangian_inequality():
    # min (x-2)² s.t. x ≤ 1  →  x* = 1   (ci(x) = 1 - x ≥ 0)
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    ci = lambda x: jnp.array([1.0 - x[0]])
    res = opt.augmented_lagrangian(f, jnp.zeros(1), ci=ci)
    np.testing.assert_allclose(float(res.x[0]), 1.0, atol=1e-4)


def test_sqp_equality_circle():
    # min x+y s.t. x²+y² = 2  →  (-1,-1)
    f = lambda x: x[0] + x[1]
    ce = lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 2.0])
    res = opt.sqp_equality(f, ce, jnp.array([1.5, 0.1]), iters=40)
    np.testing.assert_allclose(np.asarray(res.x), -1.0, atol=1e-5)


def test_log_barrier_box():
    # min (x+1)² s.t. x ≥ 0  →  x* = 0
    f = lambda x: jnp.sum((x + 1.0) ** 2)
    ci = lambda x: x  # x ≥ 0
    res = opt.log_barrier(f, ci, jnp.array([0.5]))
    np.testing.assert_allclose(float(res.x[0]), 0.0, atol=1e-3)


# ---------------------------------------------------------------- finite diff
def test_fd_matches_ad():
    f = lambda x: jnp.sin(x[0]) * x[1] ** 2 + x[2]
    x = jnp.array([0.3, -1.2, 0.7], jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.array([0.3, -1.2, 0.7])
    g_fd = opt.fd_gradient(f, x, eps=1e-4, order=4)
    g_ad = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g_fd), np.asarray(g_ad), atol=1e-5)

    vf = lambda x: jnp.array([x[0] * x[1], jnp.cos(x[2])])
    J_fd = opt.fd_jacobian(vf, x, eps=1e-4)
    J_ad = jax.jacfwd(vf)(x)
    np.testing.assert_allclose(np.asarray(J_fd), np.asarray(J_ad), atol=1e-5)

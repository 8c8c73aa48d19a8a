"""Gaussian belief states (ref: ctrl/ctrl_sys/gaussian_belief_state.hpp:603,
covariance_matrix.hpp:59, covariance_info_matrix.hpp, decomp_covariance_matrix.hpp).

A belief is a pytree ``GaussianBelief(mean, cov)``; the reference's covariance
*storage policies* (matrix / information / square-root decomposed) become
conversion helpers, since XLA fuses whatever representation algebra we write.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from reak_tpu.math.linalg import invert_pd, solve_pd, sqrtm_psd, logdet_pd


class GaussianBelief(NamedTuple):
    mean: jax.Array  # (..., n)
    cov: jax.Array  # (..., n, n)

    @property
    def information_matrix(self):
        """(ref: covariance_info_matrix.hpp)"""
        return invert_pd(self.cov)

    @property
    def sqrt_cov(self):
        """Symmetric square-root factor (ref: decomp_covariance_matrix.hpp)."""
        return sqrtm_psd(self.cov)

    def logpdf(self, x):
        """(ref: gaussian_belief_state.hpp gaussian_pdf)"""
        n = self.mean.shape[-1]
        r = x - self.mean
        maha = jnp.einsum("...i,...i->...", r, solve_pd(self.cov, r))
        return -0.5 * (maha + logdet_pd(self.cov) + n * jnp.log(2 * jnp.pi))

    def sample(self, key, shape=()):
        """Draw samples (ref: gaussian_belief_state.hpp:491 sample_gaussian_point)."""
        L = jnp.linalg.cholesky(self.cov)
        z = jax.random.normal(key, shape + self.mean.shape, dtype=self.mean.dtype)
        return self.mean + jnp.einsum("...ij,...j->...i", L, z)


def mahalanobis(b: GaussianBelief, x):
    r = x - b.mean
    return jnp.sqrt(jnp.einsum("...i,...i->...", r, solve_pd(b.cov, r)))


def symmetrized(b: GaussianBelief) -> GaussianBelief:
    return GaussianBelief(b.mean, 0.5 * (b.cov + jnp.swapaxes(b.cov, -1, -2)))


def kl_divergence(b1: GaussianBelief, b2: GaussianBelief):
    """KL(b1 ‖ b2) — the belief-space distance used by gaussian_belief_space
    (ref: gaussian_belief_space.hpp:64 symmetrized KL metric)."""
    n = b1.mean.shape[-1]
    d = b2.mean - b1.mean
    P2inv_P1 = solve_pd(b2.cov, b1.cov)
    tr = jnp.trace(P2inv_P1, axis1=-2, axis2=-1)
    maha = jnp.einsum("...i,...i->...", d, solve_pd(b2.cov, d))
    return 0.5 * (tr + maha - n + logdet_pd(b2.cov) - logdet_pd(b1.cov))


def belief_distance(b1: GaussianBelief, b2: GaussianBelief):
    """Symmetrized KL (the reference's belief-space metric)."""
    return kl_divergence(b1, b2) + kl_divergence(b2, b1)

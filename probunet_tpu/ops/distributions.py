"""Diagonal Gaussian distribution utilities.

Replaces ``torch.distributions.Independent(Normal(mu, exp(log_sigma)), 1)``
and the KL registry call (reference prob_unet.py:77, prob_unet.py:230) with an
explicit, jit-friendly implementation. The parametrization is kept identical:
``scale = exp(log_sigma)``, KL computed in float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagGaussian(NamedTuple):
    """Axis-aligned (diagonal-covariance) Gaussian over the last axis."""

    mu: jax.Array         # (..., D)
    log_sigma: jax.Array  # (..., D)

    @property
    def sigma(self) -> jax.Array:
        return jnp.exp(self.log_sigma)

    def rsample(self, rng: jax.Array) -> jax.Array:
        """Reparameterized sample (torch ``rsample``, prob_unet.py:221)."""
        eps = jax.random.normal(rng, self.mu.shape, dtype=self.mu.dtype)
        return self.mu + jnp.exp(self.log_sigma) * eps

    def sample(self, rng: jax.Array, num: int) -> jax.Array:
        """num independent draws, stacked on a leading axis."""
        eps = jax.random.normal(rng, (num,) + self.mu.shape, dtype=self.mu.dtype)
        return self.mu[None] + jnp.exp(self.log_sigma)[None] * eps

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Sum of per-dimension normal log-probs over the last axis."""
        z = (x - self.mu) * jnp.exp(-self.log_sigma)
        per_dim = -0.5 * jnp.square(z) - self.log_sigma - 0.5 * jnp.log(2 * jnp.pi)
        return per_dim.sum(axis=-1)


def kl_diag_gaussian(q: DiagGaussian, p: DiagGaussian) -> jax.Array:
    """KL(q || p) per batch element (sum over the event axis).

    Closed form for diagonal Gaussians; matches
    ``torch.distributions.kl.kl_divergence(Independent(Normal(.),1), ...)``
    (reference prob_unet.py:230). Computed in float32 for bf16 safety.
    """
    q_mu = q.mu.astype(jnp.float32)
    p_mu = p.mu.astype(jnp.float32)
    q_ls = q.log_sigma.astype(jnp.float32)
    p_ls = p.log_sigma.astype(jnp.float32)
    var_ratio = jnp.exp(2.0 * (q_ls - p_ls))
    t1 = jnp.square(q_mu - p_mu) * jnp.exp(-2.0 * p_ls)
    per_dim = 0.5 * (var_ratio + t1 - 1.0) - (q_ls - p_ls)
    return per_dim.sum(axis=-1)

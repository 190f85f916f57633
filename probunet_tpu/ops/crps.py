"""Continuous Ranked Probability Score (empirical estimator).

Probabilistic generalization of MAE for ensemble forecasts, as used by the
reference (trainmodel.py:66-117, borrowed there from pyro). Implements the
Gneiting & Raftery (2007) identity

    CRPS = E|pred - truth| - (1/2) E|pred - pred'|

with the O(n log n) sorted-spacings form of the second term: for sorted
samples x_(1) <= ... <= x_(n),

    E|X - X'| = (2 / n^2) * sum_i (x_(i+1) - x_(i)) * i * (n - i).

``crps_naive`` is the quadratic-time oracle used in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crps_empirical(pred: jax.Array, truth: jax.Array) -> jax.Array:
    """CRPS per element.

    pred: (num_samples,) + truth.shape — ensemble on the leading axis
          (reference trainmodel.py:87-89 contract).
    truth: observations.
    Returns an array of shape ``truth.shape``.
    """
    if pred.shape[1:] != truth.shape:
        raise ValueError(f"pred must be (S,)+truth.shape; got {pred.shape} vs {truth.shape}")
    n = pred.shape[0]
    if n == 1:
        return jnp.abs(pred[0] - truth)
    mae = jnp.abs(pred - truth).mean(axis=0)
    srt = jnp.sort(pred, axis=0)
    diff = srt[1:] - srt[:-1]                      # (n-1, ...)
    i = jnp.arange(1, n, dtype=pred.dtype)         # 1..n-1
    weight = (i * i[::-1]).reshape((n - 1,) + (1,) * truth.ndim)
    return mae - (diff * weight).sum(axis=0) / (n * n)


def crps_naive(pred: jax.Array, truth: jax.Array) -> jax.Array:
    """O(n^2) direct evaluation of the CRPS identity (test oracle)."""
    mae = jnp.abs(pred - truth).mean(axis=0)
    pairwise = jnp.abs(pred[None, :] - pred[:, None]).mean(axis=(0, 1))
    return mae - 0.5 * pairwise

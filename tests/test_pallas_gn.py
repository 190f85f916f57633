"""Fused GroupNorm+SiLU: XLA path vs reference math, interpret-mode Pallas
kernel vs XLA path, custom-VJP gradients vs jax autodiff of the plain impl."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.ops.norm import group_norm, num_groups_for
from probunet_tpu.ops.pallas_gn import gn_silu


def _plain_gn_silu(x, w, b, groups, eps=1e-5):
    y = group_norm(x, w, b, groups, eps)
    return y * jax.nn.sigmoid(y)


def _data(bsz=2, h=8, w=8, c=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bsz, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    return x, gamma, beta


@pytest.mark.parametrize("c", [64, 128])
def test_xla_path_matches_plain(c):
    x, gamma, beta = _data(c=c)
    g = num_groups_for(c)
    out = gn_silu(x, gamma, beta, g, 1e-5, "xla")
    ref = _plain_gn_silu(x, gamma, beta, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_interpret_kernel_matches_xla():
    x, gamma, beta = _data(c=64, seed=1)
    g = num_groups_for(64)
    out_k = gn_silu(x, gamma, beta, g, 1e-5, "interpret")
    out_x = gn_silu(x, gamma, beta, g, 1e-5, "xla")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    x, gamma, beta = _data(c=64, seed=2)
    g = num_groups_for(64)

    def loss_fused(x, gamma, beta):
        return jnp.sum(jnp.square(gn_silu(x, gamma, beta, g, 1e-5, "xla")))

    def loss_plain(x, gamma, beta):
        return jnp.sum(jnp.square(_plain_gn_silu(x, gamma, beta, g)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_custom_vjp_through_interpret_kernel():
    x, gamma, beta = _data(bsz=1, h=4, w=4, c=32, seed=3)
    g = num_groups_for(32)

    def loss_k(x):
        return jnp.sum(gn_silu(x, gamma, beta, g, 1e-5, "interpret"))

    def loss_p(x):
        return jnp.sum(_plain_gn_silu(x, gamma, beta, g))

    np.testing.assert_allclose(np.asarray(jax.grad(loss_k)(x)),
                               np.asarray(jax.grad(loss_p)(x)), rtol=1e-4, atol=1e-4)


def test_bf16_activation():
    x, gamma, beta = _data(c=64, seed=4)
    xb = x.astype(jnp.bfloat16)
    g = num_groups_for(64)
    out = gn_silu(xb, gamma, beta, g, 1e-5, "xla")
    assert out.dtype == jnp.bfloat16
    ref = _plain_gn_silu(x, gamma, beta, g)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)

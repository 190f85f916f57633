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


def test_channel_split_kernel_matches_xla(monkeypatch):
    """Large activations split the channel/group dim across grid invocations
    (the VMEM fix for batch>=64 at 64x64 c=256 — round-4); forced here by
    shrinking the budget so the 2-way split engages in interpret mode."""
    import probunet_tpu.ops.pallas_gn as pg

    c = 256
    x, gamma, beta = _data(bsz=2, h=8, w=8, c=c, seed=5)
    g = num_groups_for(c)
    k0 = pg._split_factor(8, 8, c, g, 4)
    assert k0 == 1
    monkeypatch.setattr(pg, "_VMEM_BUDGET", 8 * 8 * (c // 2) * (4 * 4 + 12))
    assert pg._split_factor(8, 8, c, g, 4) == 2
    out_k = gn_silu(x, gamma, beta, g, 1e-5, "interpret")
    out_x = gn_silu(x, gamma, beta, g, 1e-5, "xla")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)


def test_split_factor_lane_alignment():
    """Splits never break lane alignment (c/k % 128) or group divisibility;
    unsplittable shapes report k=1 and the caller falls back to XLA."""
    import probunet_tpu.ops.pallas_gn as pg

    # 128x128 c=128: estimate over budget but c/2 = 64 is not lane-aligned
    assert pg._split_factor(128, 128, 128, 32, 2) == 1
    assert not pg._fits_vmem((1, 128, 128, 128), np.float32, 32)
    # 64x64 c=256 bf16: the shape that OOM'd scoped vmem -> 2-way split fits
    assert pg._split_factor(64, 64, 256, 32, 2) == 2
    assert pg._fits_vmem((1, 64, 64, 256), np.dtype(np.float16), 32)


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

"""Fused Pallas attention == unfused XLA attention (forward and gradients),
exercised in interpreter mode on CPU for both numerics modes and both the
single-chunk and multi-chunk backward paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probunet_tpu.ops.pallas_attn import _ROW_CHUNK, _xla_attention, fused_attention


def _qkv(L, nh=2, ch=64, b=2, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.standard_normal((b, L, nh, ch)), dtype)
    return mk(0), mk(1), mk(2)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("L", [64, 512])
def test_forward_matches_xla(fast, L):
    dtype = jnp.bfloat16 if fast else jnp.float32
    q, k, v = _qkv(L, dtype=dtype)
    ref = _xla_attention(q, k, v, fast)
    out = fused_attention(q, k, v, fast, "interpret")
    assert out.shape == ref.shape and out.dtype == ref.dtype
    tol = 2e-2 if fast else 2e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("L", [64, 512])   # 512 > _ROW_CHUNK=256: multi-chunk bwd
def test_gradients_match_xla(fast, L):
    assert _ROW_CHUNK == 256
    dtype = jnp.bfloat16 if fast else jnp.float32
    q, k, v = _qkv(L, dtype=dtype, seed=1)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(
            fused_attention(q, k, v, fast, "interpret").astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(_xla_attention(q, k, v, fast).astype(jnp.float32)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    tol = 5e-2 if fast else 1e-4
    for a, b in zip(g_fused, g_ref):
        ra = np.asarray(a, np.float32)
        rb = np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(rb).max()))
        np.testing.assert_allclose(ra / scale, rb / scale, atol=tol)


def test_unet_block_uses_fused_path_equivalently():
    """UNet forward with the fused (interpret) attention == env-disabled XLA
    attention on the same weights."""
    import os

    from probunet_tpu.models import UNet

    kw = dict(img_resolution=(16, 16), in_channels=3, out_channels=3, label_dim=0,
              use_diffuse=False, model_channels=64, channel_mult=(1,), num_blocks=1,
              attn_resolutions=(16,), dropout=0.0)
    m = UNet(**kw)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 16, 3)), jnp.float32)
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    # perturb the zero-init attention proj so the attention output matters
    params = jax.tree.map(lambda p: p + 0.03, v["params"])
    os.environ["PROBUNET_DISABLE_PALLAS"] = "1"
    try:
        ref = m.apply({"params": params}, x, train=False)
    finally:
        del os.environ["PROBUNET_DISABLE_PALLAS"]
    out = m.apply({"params": params}, x, train=False)  # CPU: auto -> XLA too
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

"""Production fast-mode knobs: fast attention and cheap dropout RNG."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.models.layers import attention_weights
from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.train import create_train_state, make_probunet_train_step
from probunet_tpu.train.state import make_optimizer


def test_fast_attention_close_to_fp32():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 64, 2, 32)), jnp.bfloat16)
    ref = attention_weights(q, k)
    fast = attention_weights(q, k, fast=True)
    # attention weights are probabilities; bf16 QK^T shifts them only slightly
    err = np.abs(np.asarray(fast, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < 0.05, f"fast attention diverged: {err}"
    assert err > 0, "fast path did not change numerics at all (flag not threaded?)"


def test_fast_attention_env_alias(monkeypatch):
    """The legacy PROBUNET_FAST_ATTN env var still selects the fast path."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 32, 1, 16)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 32, 1, 16)), jnp.bfloat16)
    explicit = attention_weights(q, k, fast=True)
    monkeypatch.setenv("PROBUNET_FAST_ATTN", "1")
    legacy = attention_weights(q, k)
    assert np.array_equal(np.asarray(explicit, np.float32), np.asarray(legacy, np.float32))


def test_fast_attention_threads_through_model():
    """Two models with opposite fast_attention settings coexist in one process
    and produce (slightly) different attention numerics on the same weights."""
    from probunet_tpu.models import UNet

    kw = dict(img_resolution=(16, 16), in_channels=3, out_channels=3, label_dim=0,
              use_diffuse=False, model_channels=16, channel_mult=(1, 2), num_blocks=1,
              attn_resolutions=(8,), dropout=0.0)
    m_ref = UNet(**kw)
    m_fast = UNet(fast_attention=True, **kw)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 16, 3)), jnp.bfloat16)
    v = m_ref.init({"params": jax.random.key(0)}, x, train=False)
    y_ref = m_ref.apply(v, x, train=False)
    y_fast = m_fast.apply(v, x, train=False)  # same params, fast attention
    d = np.abs(np.asarray(y_ref, np.float32) - np.asarray(y_fast, np.float32))
    assert np.isfinite(d).all()
    # close (it's only a matmul-dtype change) ...
    assert d.max() < 0.1


def test_unsafe_rbg_training_step():
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=4,
                              num_filters=(8,), img_resolution=(16, 16),
                              model_channels=8, channel_mult=(1, 2), num_blocks=1,
                              attn_resolutions=(8,), dropout=0.1)
    tx = make_optimizer(lr=1e-3)
    x = jnp.zeros((1, 16, 16, 3))
    v = model.init({"params": jax.random.key(0), "latent": jax.random.key(1),
                    "dropout": jax.random.key(2)}, x, x, method=model.elbo)
    state = create_train_state(v["params"], tx)
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((8, 16, 16, 3)), jnp.float32)
    stats = transforms.compute_lr_stats(hr, 2, "perpixel")
    step = make_probunet_train_step(model, tx, 2, "perpixel", donate=False)
    rng = jax.random.key(3, impl="unsafe_rbg")
    state, m = step(state, hr, stats, jnp.arange(4), rng)
    assert np.isfinite(float(m["train_loss"]))
    assert int(state.step) == 1

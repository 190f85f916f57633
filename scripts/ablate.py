#!/usr/bin/env python
"""Ablation timing of the fused train step (honest value-fetch barriers):
quantifies dropout RNG, attention, and dtype costs to direct optimization."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from probunet_tpu.utils.hostinit import ensure_cpu_backend

ensure_cpu_backend()
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_probunet"))

import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.train import create_train_state, make_probunet_train_step
from probunet_tpu.train.state import make_optimizer


def time_variant(name, dropout=0.1, attn=(32, 16, 8), dtype=jnp.bfloat16,
                 batch=8, res=64, steps=20):
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512), img_resolution=(res, res),
                              dropout=dropout, attn_resolutions=attn)
    tx = make_optimizer(lr=1e-3)
    x0 = jnp.zeros((1, res, res, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(0)
    params = jax.tree.map(lambda s: jnp.asarray(
        fill.standard_normal(s.shape).astype(np.float32) * 0.02, s.dtype), va)["params"]
    state = jax.device_put(create_train_state(params, tx), jax.devices()[0])
    t = 64
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((t, res, res, 3)), jnp.float32)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    step = make_probunet_train_step(model, tx, 4, "perpixel", compute_dtype=dtype, donate=True)
    rng = jax.random.key(3)
    idx0 = jnp.arange(batch)
    state, m = step(state, hr, stats, idx0, rng)
    float(m["train_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, hr, stats, (idx0 + i * batch) % t, rng)
    float(m["train_loss"])
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:24s}: {dt*1000:6.1f} ms/step  {batch/dt:7.1f} samples/s", flush=True)
    return dt


def time_rng_variant(name, impl):
    import probunet_tpu.train.steps as steps_mod
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512), img_resolution=(64, 64))
    tx = make_optimizer(lr=1e-3)
    x0 = jnp.zeros((1, 64, 64, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(0)
    params = jax.tree.map(lambda s: jnp.asarray(
        fill.standard_normal(s.shape).astype(np.float32) * 0.02, s.dtype), va)["params"]
    state = jax.device_put(create_train_state(params, tx), jax.devices()[0])
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((64, 64, 64, 3)), jnp.float32)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    step = make_probunet_train_step(model, tx, 4, "perpixel",
                                    compute_dtype=jnp.bfloat16, donate=True)
    rng = jax.random.key(3, impl=impl)
    idx0 = jnp.arange(8)
    state, m = step(state, hr, stats, idx0, rng)
    float(m["train_loss"])
    import time as _t
    t0 = _t.perf_counter()
    for i in range(20):
        state, m = step(state, hr, stats, (idx0 + i * 8) % 64, rng)
    float(m["train_loss"])
    dt = (_t.perf_counter() - t0) / 20
    print(f"{name:24s}: {dt*1000:6.1f} ms/step  {8/dt:7.1f} samples/s", flush=True)


if __name__ == "__main__":
    which = os.environ.get("ABLATE", "all")
    if which in ("all", "base"):
        time_variant("base (bf16,drop,attn)")
    if which == "all":
        time_variant("dropout=0", dropout=0.0)
        time_variant("no attention", attn=())
        time_variant("fp32 compute", dtype=jnp.float32)
    if which in ("all", "rng"):
        time_rng_variant("rbg dropout rng", "rbg")
        time_rng_variant("unsafe_rbg rng", "unsafe_rbg")


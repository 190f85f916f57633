#!/usr/bin/env python
"""Micro-harness: time the fused prob-U-Net train step on the current backend
under different configurations (pallas on/off, dtype, batch, resolution)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from probunet_tpu.utils.hostinit import ensure_cpu_backend

ensure_cpu_backend()
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_probunet"))

import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.train import create_train_state, make_probunet_train_step
from probunet_tpu.train.state import make_optimizer


def time_step(batch=8, res=64, dtype="bf16", steps=30, scale=4):
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512), img_resolution=(res, res),
                              remat=os.environ.get("REMAT", "0") == "1")
    tx = make_optimizer(lr=1e-3)
    x0 = jnp.zeros((1, res, res, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    params = jax.tree.map(lambda s: (jnp.zeros(s.shape, s.dtype) + 0.01), va)["params"]
    state = create_train_state(params, tx)
    t = max(int(os.environ.get("T", "64")), batch)
    hr = jnp.asarray(np.random.default_rng(0).standard_normal((t, res, res, 3)), jnp.float32)
    stats = transforms.compute_lr_stats(hr, scale, "perpixel")
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    step = make_probunet_train_step(model, tx, scale, "perpixel",
                                    compute_dtype=cd, donate=True)
    idx = jnp.arange(batch) % t
    rng = jax.random.key(3)
    t0 = time.perf_counter()
    state, m = step(state, hr, stats, idx, rng)
    _ = float(m["train_loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(steps):
        # thread the state (chained, un-dedupable) and fetch a VALUE at the
        # end: block_until_ready is not a reliable barrier on this runtime
        state, m = step(state, hr, stats, (idx + i) % t, rng)
    _ = float(m["train_loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt, compile_s


if __name__ == "__main__":
    batch = int(os.environ.get("B", "8"))
    res = int(os.environ.get("RES", "64"))
    dtype = os.environ.get("DT", "bf16")
    dt, cs = time_step(batch=batch, res=res, dtype=dtype)
    tag = "xla" if os.environ.get("PROBUNET_DISABLE_PALLAS") else "pallas-auto"
    print(f"[{tag}] batch={batch} res={res} dt={dtype}: {dt*1000:.1f} ms/step, "
          f"{batch/dt:.1f} samples/s (compile {cs:.0f}s)")

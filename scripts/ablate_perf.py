#!/usr/bin/env python
"""Perf attribution at the bench config (128x128 b8, fast mode): time the full
fused step against ablations (no attention, fp32 attention, scan-multistep) to
locate the remaining gap to the measured compute ceiling. Honest timing: a
host value fetch inside the timed window (NOTES.md — block_until_ready is not
a barrier here)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_probunet"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.train import (create_train_state, make_probunet_train_step,
                                make_probunet_train_multistep)
from probunet_tpu.train.state import make_optimizer

RES = int(os.environ.get("RES", "128"))
B = int(os.environ.get("B", "8"))
STEPS = int(os.environ.get("STEPS", "40"))
T = 64


def build(fast_attn=True, attn=(32, 16, 8)):
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512),
                              img_resolution=(RES, RES),
                              attn_resolutions=tuple(attn),
                              fast_attention=fast_attn)
    tx = make_optimizer(lr=1e-3)
    x0 = jnp.zeros((1, RES, RES, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(fill.standard_normal(s.shape).astype(np.float32)
                              * (1.0 / np.sqrt(max(1, int(np.prod(s.shape[:-1]))))),
                              dtype=s.dtype), va)["params"]
    state = create_train_state(params, tx)
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((T, RES, RES, 3))
                     .astype(np.float32) + 2.0)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    return model, tx, state, hr, stats


def timeit(name, fn, state, n=STEPS):
    state, m = fn(state, 0)
    float(jax.tree.leaves(m)[0].ravel()[0])   # compile + barrier
    for w in range(3):
        state, m = fn(state, 1 + w)
    float(jax.tree.leaves(m)[0].ravel()[0])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = fn(state, 4 + i)
    float(jax.tree.leaves(m)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1000:7.2f} ms/step  {B/dt:7.1f} samples/s", flush=True)
    return dt


def per_step(model, tx, state, hr, stats):
    rng = jax.random.key(3, impl="unsafe_rbg")
    step = make_probunet_train_step(model, tx, 4, "perpixel",
                                    compute_dtype=jnp.bfloat16, donate=True)
    idx0 = jnp.arange(B)
    return lambda s, i: step(s, hr, stats, (idx0 + i * B) % T, rng)


def multi_step(model, tx, state, hr, stats, k):
    rng = jax.random.key(3, impl="unsafe_rbg")
    multi = make_probunet_train_multistep(model, tx, 4, "perpixel",
                                          compute_dtype=jnp.bfloat16, donate=True)
    idx0 = jnp.arange(k * B).reshape(k, B)

    def fn(s, i):
        s, m = multi(s, hr, stats, (idx0 + i * k * B) % T, rng)
        return s, {"loss": m["train_loss"][-1]}
    return fn


def main():
    print(f"devices: {jax.devices()}  res={RES} b={B}")
    model, tx, state, hr, stats = build(fast_attn=True)
    t_fast = timeit("fast attn, per-step", per_step(model, tx, state, hr, stats), state)

    for k in (4, 8):
        model, tx, state, hr, stats = build(fast_attn=True)
        fn = multi_step(model, tx, state, hr, stats, k)
        dt = timeit(f"fast attn, scan multistep k={k}", fn, state, n=max(8, STEPS // k))
        print(f"{'':34s} -> per optimizer step: {dt*1000/k:7.2f} ms, "
              f"{B*k/dt:7.1f} samples/s", flush=True)

    model, tx, state, hr, stats = build(fast_attn=False)
    timeit("fp32 attn, per-step", per_step(model, tx, state, hr, stats), state)

    model, tx, state, hr, stats = build(fast_attn=True, attn=())
    timeit("NO level attn (bottleneck only)", per_step(model, tx, state, hr, stats), state)


if __name__ == "__main__":
    main()

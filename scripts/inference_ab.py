#!/usr/bin/env python
"""A/B the ensemble-inference path: Pallas fused attention vs XLA attention.

Round-2 bench showed 16-draw ensemble inference regressing 188 -> 171
inputs/s at 128x128 while training improved — the suspect is the fused
attention kernel, which pays off when it removes the (B, H, L, L) weight
tensor from the BACKWARD pass but may lose to XLA's fully-fused forward-only
attention in inference. This measures exactly that, at both fast (bf16 QK^T)
and strict (fp32) numerics.

Honest timing: chained value-fetch inside the timed window (NOTES.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from probunet_tpu.utils.hostinit import ensure_cpu_backend

ensure_cpu_backend()
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_probunet"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.models import ProbabilisticUNet
from probunet_tpu.train import make_sample_fn

RES = int(os.environ.get("BENCH_RES", "128"))
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
K = int(os.environ.get("BENCH_K", "16"))
N = int(os.environ.get("N", "20"))


def build(fast):
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512),
                              img_resolution=(RES, RES), fast_attention=fast)
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    x0 = jnp.zeros((1, RES, RES, 3))
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(fill.standard_normal(s.shape).astype(np.float32)
                              * (1.0 / np.sqrt(max(1, int(np.prod(s.shape[:-1]))))),
                              dtype=s.dtype), va)["params"]
    return model, params


def run(tag, fast, disable_pallas):
    # the kernel/XLA decision is read from the env at TRACE time
    if disable_pallas:
        os.environ["PROBUNET_DISABLE_PALLAS_ATTN"] = "1"
    else:
        os.environ.pop("PROBUNET_DISABLE_PALLAS_ATTN", None)
    model, params = build(fast)
    dtype = jnp.bfloat16
    sample_fn = make_sample_fn(model, 4, "perpixel", K, dtype)
    t = 64
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((t, RES, RES, 3))
                     .astype(np.float32) + 2.0)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    rng = jax.random.key(3)
    idx0 = jnp.arange(BATCH)
    hp, _ = sample_fn(params, hr, stats, idx0, rng)
    float(hp.sum())                       # compile + warm
    t0 = time.perf_counter()
    acc = None
    for i in range(N):
        hp, _ = sample_fn(params, hr, stats, (idx0 + i * BATCH) % t, rng)
        acc = hp if acc is None else acc + hp
    float(acc.sum())
    dt = (time.perf_counter() - t0) / N
    print(f"{tag:34s} {BATCH / dt:7.1f} inputs/s  ({dt * 1e3:6.1f} ms / batch of "
          f"{BATCH} x {K} draws)", flush=True)
    return BATCH / dt


def main():
    print(f"devices: {jax.devices()}  res={RES} b={BATCH} K={K}", flush=True)
    # TWO passes per config, report the second: the first timed window of a
    # freshly-benched executable in this process reads slow (per-process
    # warmup artifact, see NOTES.md) — pass 1 is the warm-up.
    for p in (1, 2):
        print(f"--- pass {p} ---", flush=True)
        run("fast + pallas attention", True, False)
        run("fast + xla attention", True, True)
        run("strict + pallas attention", False, False)
        run("strict + xla attention", False, True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: Probabilistic U-Net fused training-step throughput.

Runs the flagship configuration of the reference's recorded run
(BASELINE.md: prob-U-Net, 64x64 tiles, 3 variables, batch 8, latent_dim 6,
num_filters [64,128,256,512], perpixel standardization, AdamW) as this
framework's single-XLA-program train step on one chip, and reports samples/sec
against the reference's recorded 13.18 it/s * 8 = 105.4 samples/s
(notebooks/test_prob_unet.ipynb cell 1).

Prints ONE JSON line to stdout. Diagnostics go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SAMPLES_PER_SEC = 13.185 * 8  # BASELINE.md training throughput


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from probunet_tpu.utils.hostinit import ensure_cpu_backend

    ensure_cpu_backend()  # must run before any backend use (host-side init)

    # Persistent compilation cache: repeat bench/driver runs skip XLA compiles.
    cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_probunet"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from probunet_tpu.data import transforms
    from probunet_tpu.models import ProbabilisticUNet
    from probunet_tpu.train import (
        create_train_state,
        make_probunet_train_multistep,
        make_probunet_train_step,
    )
    from probunet_tpu.train.state import make_optimizer

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    compute_dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    log(f"devices: {jax.devices()}")
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512))
    tx = make_optimizer(lr=1e-3)
    x0 = jnp.zeros((1, 64, 64, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    t0 = time.perf_counter()
    # Throughput is weight-value independent: materialize the param tree from
    # shapes only (real training uses probunet_tpu.utils.hostinit.init_on_cpu).
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill_rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            fill_rng.standard_normal(s.shape).astype(np.float32)
            * (1.0 / np.sqrt(max(1, int(np.prod(s.shape[:-1]))))), dtype=s.dtype),
        va)["params"]
    state = jax.device_put(create_train_state(params, tx), jax.devices()[0])
    log(f"init: {time.perf_counter() - t0:.1f}s, "
        f"params={sum(p.size for p in jax.tree.leaves(state.params)):,}")

    # Synthetic device-resident dataset (same shapes as the recorded run).
    t = 512
    rng_np = np.random.default_rng(0)
    hr = jnp.asarray(rng_np.standard_normal((t, 64, 64, 3)).astype(np.float32) + 2.0)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")

    step = make_probunet_train_step(model, tx, 4, "perpixel",
                                    compute_dtype=compute_dtype, donate=True)
    rng = jax.random.key(3)
    idx0 = jnp.arange(batch)

    t0 = time.perf_counter()
    state, metrics = step(state, hr, stats, idx0, rng)
    jax.block_until_ready(metrics["train_loss"])
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    for w in range(5):  # warmup
        state, metrics = step(state, hr, stats, (idx0 + w * batch) % t, rng)
    jax.block_until_ready(metrics["train_loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, hr, stats, (idx0 + i * batch) % t, rng)
    jax.block_until_ready(metrics["train_loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = steps / dt
    samples_per_sec = steps_per_sec * batch
    log(f"{steps} steps in {dt:.2f}s -> {steps_per_sec:.2f} steps/s, "
        f"{samples_per_sec:.1f} samples/s (loss={float(metrics["train_loss"]):.2f})")

    print(json.dumps({
        "metric": "probunet_train_samples_per_sec_64x64_b8",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Batch-scaling benchmark: the reference's sweep grid (sweeps.yaml batch
8..1024) run on the real TPU at 64x64 and 128x128 tiles (VERDICT round-3 ask
#2 — the per-shape roofline says small-spatial convs sit at 5-21% of MXU
peak, and batch is the one untried lever).

Per (res, batch) point: the production fused train step (fast mode: bf16
compute, fused attention, unsafe_rbg RNG, bf16 Adam mu/grads), timed over two
windows with a host value fetch as the barrier (NOTES.md rules #1-#2), the
SECOND window reported. Rematerialization is retried automatically on OOM and
reported. Prints a JSON array to stdout; per-point lines to stderr.

Run exclusively (never next to the CPU test suite — NOTES.md #3):

    python scripts/batch_scaling.py [--res 64,128] [--batches 8,16,32,64,128,256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_state(model, tx, res, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from probunet_tpu.train import create_train_state

    x0 = jnp.zeros((1, res, res, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(seed)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            fill.standard_normal(s.shape).astype(np.float32)
            * (1.0 / np.sqrt(max(1, int(np.prod(s.shape[:-1]))))), dtype=s.dtype),
        va)["params"]
    return jax.device_put(create_train_state(params, tx), jax.devices()[0])


def bench_point(res, batch, remat, steps, window2_only=True):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from probunet_tpu.data import transforms
    from probunet_tpu.models import ProbabilisticUNet
    from probunet_tpu.train import make_probunet_train_step
    from probunet_tpu.train.state import make_optimizer

    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512),
                              img_resolution=(res, res), fast_attention=True,
                              remat=remat)
    tx = make_optimizer(lr=1e-3, state_dtype="bfloat16")
    state = build_state(model, tx, res)

    t = max(256, batch)
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((t, res, res, 3))
                     .astype(np.float32) + 2.0)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    step = make_probunet_train_step(model, tx, 4, "perpixel",
                                    compute_dtype=jnp.bfloat16, donate=True)
    rng = jax.random.key(3, impl="unsafe_rbg")
    idx0 = jnp.arange(batch)

    # flops estimate (per step) from the compiled executable, when available
    flops = None
    try:
        ca = step.lower(state, hr, stats, idx0, rng).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:  # remote-compile helpers may not expose it
        log(f"  (cost_analysis unavailable: {type(e).__name__})")

    t0 = time.perf_counter()
    state, metrics = step(state, hr, stats, idx0, rng)
    loss0 = float(metrics["train_loss"])
    log(f"  compile+first step: {time.perf_counter() - t0:.1f}s loss={loss0:.1f}")

    for w in range(5):
        state, metrics = step(state, hr, stats, (idx0 + w * batch) % t, rng)
    float(metrics["train_loss"])

    rates = []
    for window in range(2):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(state, hr, stats, (idx0 + i * batch) % t, rng)
        float(metrics["train_loss"])  # host value fetch = honest barrier
        dt = time.perf_counter() - t0
        rates.append(steps * batch / dt)
    rate = rates[-1]
    return {"res": res, "batch": batch, "remat": remat,
            "samples_per_sec": round(rate, 1),
            "step_ms": round(1000.0 * batch / rate, 2),
            "windows": [round(r, 1) for r in rates],
            "tflops_per_sec": (round(flops * rate / batch / 1e12, 1)
                               if flops else None),
            "flops_per_step": flops}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="64,128")
    ap.add_argument("--batches", default="8,16,32,64,128,256")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    from probunet_tpu.utils.hostinit import ensure_cpu_backend
    ensure_cpu_backend()
    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_probunet"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    results = []
    for res in (int(r) for r in args.res.split(",")):
        for batch in (int(b) for b in args.batches.split(",")):
            for remat in (False, True):
                label = f"{res}x{res} b{batch}{' remat' if remat else ''}"
                log(f"=== {label} ===")
                try:
                    r = bench_point(res, batch, remat, args.steps)
                except Exception as e:
                    log(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")
                    if not remat:
                        continue  # try the remat variant
                    break
                results.append(r)
                log(f"  {r['samples_per_sec']} samples/s ({r['step_ms']} ms/step)"
                    + (f", {r['tflops_per_sec']} TF/s" if r['tflops_per_sec'] else ""))
                if not remat:
                    break  # no-remat worked; skip the remat variant
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

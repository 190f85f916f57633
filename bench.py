#!/usr/bin/env python
"""Headline benchmark: Probabilistic U-Net fused training-step throughput at
128x128 tiles (the BASELINE.json metric: "training steps/sec/chip ... at
128x128 tiles", north star >=20x PyTorch-CPU per chip).

Baseline: the reference's own ProbabilisticUNet.elbo + AdamW step measured on
torch-CPU in this environment at the same config = 0.0427 samples/s
(see BASELINE_MEASURED.md). The reference's recorded 64x64 notebook run
(105.4 samples/s, unknown device) is reported to stderr for context.

Prints ONE JSON line to stdout. Diagnostics go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TORCH_CPU_SAMPLES_PER_SEC = {64: 0.144, 128: 0.0427}  # measured, BASELINE_MEASURED.md
RECORDED_64_SAMPLES_PER_SEC = 13.185 * 8  # reference notebook, BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from probunet_tpu.utils.hostinit import ensure_cpu_backend

    ensure_cpu_backend()  # must run before any backend use

    cache_dir = os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_probunet"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from probunet_tpu.data import transforms
    from probunet_tpu.models import ProbabilisticUNet
    from probunet_tpu.train import create_train_state, make_probunet_train_step
    from probunet_tpu.train.state import make_optimizer

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    res = int(os.environ.get("BENCH_RES", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    compute_dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    # production fast mode (default): bf16 QK^T attention + unsafe_rbg dropout
    # RNG. BENCH_MODE=strict keeps the reference's fp32 attention + threefry.
    fast = os.environ.get("BENCH_MODE", "fast") == "fast"
    rng_impl = "unsafe_rbg" if fast else "threefry2x32"
    # fast = production mode: fused Pallas attention with bf16 QK^T, unsafe_rbg
    # dropout RNG, bf16 AdamW mu/grads (the optimizer is HBM-bandwidth-bound).
    opt_state_dtype = "bfloat16" if fast else "float32"
    log(f"mode: {'fast (bf16 attn, unsafe_rbg rng, bf16 adam mu/grads)' if fast else 'strict parity'}")

    log(f"devices: {jax.devices()}")

    def build(res_):
        """Model + filled state + synthetic device-resident dataset at res_.
        Throughput is weight-value independent: the param tree comes from
        eval_shape + host fill (real training uses utils.hostinit)."""
        model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                                  num_filters=(64, 128, 256, 512),
                                  img_resolution=(res_, res_), fast_attention=fast)
        tx = make_optimizer(lr=1e-3, state_dtype=opt_state_dtype)
        x0 = jnp.zeros((1, res_, res_, 3))
        rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
                "dropout": jax.random.key(2)}
        t0 = time.perf_counter()
        va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
        fill_rng = np.random.default_rng(0)
        params = jax.tree.map(
            lambda s: jnp.asarray(
                fill_rng.standard_normal(s.shape).astype(np.float32)
                * (1.0 / np.sqrt(max(1, int(np.prod(s.shape[:-1]))))), dtype=s.dtype),
            va)["params"]
        state = jax.device_put(create_train_state(params, tx), jax.devices()[0])
        log(f"init {res_}x{res_}: {time.perf_counter() - t0:.1f}s, "
            f"params={sum(p.size for p in jax.tree.leaves(state.params)):,}")
        t = 256
        hr = jnp.asarray(np.random.default_rng(1)
                         .standard_normal((t, res_, res_, 3)).astype(np.float32) + 2.0)
        stats = transforms.compute_lr_stats(hr, 4, "perpixel")
        step = make_probunet_train_step(model, tx, 4, "perpixel",
                                        compute_dtype=compute_dtype, donate=True)
        return model, state, hr, stats, step, t

    def measure(step, state, hr, stats, t, batch_, steps_):
        """Timed training throughput; host value fetch is the barrier
        (block_until_ready is not reliable on this runtime — NOTES.md #1)."""
        rng = jax.random.key(3, impl=rng_impl)
        idx0 = jnp.arange(batch_)
        t0 = time.perf_counter()
        state, metrics = step(state, hr, stats, idx0, rng)
        float(metrics["train_loss"])
        log(f"compile+first step: {time.perf_counter() - t0:.1f}s")
        for w in range(5):  # warmup
            state, metrics = step(state, hr, stats, (idx0 + w * batch_) % t, rng)
        float(metrics["train_loss"])
        t0 = time.perf_counter()
        for i in range(steps_):
            state, metrics = step(state, hr, stats, (idx0 + i * batch_) % t, rng)
        float(metrics["train_loss"])
        dt = time.perf_counter() - t0
        return state, metrics, steps_ / dt * batch_

    model, state, hr, stats, step, t = build(res)
    state, metrics, samples_per_sec = measure(step, state, hr, stats, t, batch, steps)
    steps_per_sec = samples_per_sec / batch
    log(f"{steps_per_sec:.2f} steps/s, "
        f"{samples_per_sec:.1f} samples/s at {res}x{res} b{batch} "
        f"(loss={float(metrics['train_loss']):.2f})")
    base = TORCH_CPU_SAMPLES_PER_SEC.get(res, 0.0427 * (128 * 128) / (res * res))
    log(f"vs measured torch-CPU @{res}x{res} ({base} samples/s): "
        f"{samples_per_sec / base:.0f}x")
    log(f"context: reference recorded 64x64 run = {RECORDED_64_SAMPLES_PER_SEC:.1f} samples/s")

    # secondary: 16-draw ensemble inference (BASELINE config #3), stderr only.
    # TWO timed windows, report the second: the first timed window of a
    # freshly-started executable on this runtime reads ~2x slow (a per-process
    # warmup artifact, NOT real inference cost — it inflated rounds 1-2's
    # inference numbers; see NOTES.md and scripts/inference_ab.py).
    from probunet_tpu.train import make_sample_fn
    sample_fn = make_sample_fn(model, 4, "perpixel", 16, compute_dtype)
    rng = jax.random.key(3, impl=rng_impl)
    idx0 = jnp.arange(batch)
    hp, _ = sample_fn(state.params, hr, stats, idx0, rng)
    float(hp.sum())
    for window in range(2):
        t0 = time.perf_counter()
        acc = None
        for i in range(20):
            hp, _ = sample_fn(state.params, hr, stats, (idx0 + i * batch) % t, rng)
            acc = hp if acc is None else acc + hp  # chain to prevent elision
        float(acc.sum())
        inf_dt = (time.perf_counter() - t0) / 20
    log(f"inference (16-draw ensembles): {batch / inf_dt:.1f} inputs/s = "
        f"{16 * batch / inf_dt:.0f} ensemble members/s at {res}x{res} "
        f"(second window)")

    record = {
        "metric": f"probunet_train_samples_per_sec_{res}x{res}_b{batch}",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec",
        "vs_baseline": round(samples_per_sec / base, 1),
    }

    # Secondary headline: 64x64 at the throughput-optimal batch found by the
    # round-4 batch-scaling sweep (b128; BASELINE_MEASURED.md round-4 table).
    # Same timing discipline; skipped when the primary config already covers
    # it or when explicitly disabled.
    if os.environ.get("BENCH_SECONDARY", "1") != "0" and (res, batch) != (64, 128):
        # free the primary model's HBM (params + Adam state + dataset +
        # ensemble buffers) before building the b128 leg
        del state, hr, stats, step, metrics, sample_fn, hp, acc
        _, st2, hr2, stats2, step2, t2 = build(64)
        _, m2, sps2 = measure(step2, st2, hr2, stats2, t2, 128, max(10, steps // 2))
        base64 = TORCH_CPU_SAMPLES_PER_SEC[64]
        log(f"secondary: {sps2:.1f} samples/s at 64x64 b128 "
            f"({sps2 / base64:.0f}x torch-CPU)")
        record["secondary_metric"] = "probunet_train_samples_per_sec_64x64_b128"
        record["secondary_value"] = round(sps2, 2)
        record["secondary_vs_baseline"] = round(sps2 / base64, 1)

    print(json.dumps(record))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the multi-host batch plan's per-step host-assembly overhead on one
chip: the `--data_shards 2` plan path (global batches assembled on the host,
background-thread prefetched) vs the device-resident gather path, at
assembly depths 2 and 4 (`--prefetch_buffer`).

Methodology follows bench.py: production fast mode, host value fetch as the
barrier, two timed windows with the second reported. Run exclusively.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
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
    from probunet_tpu.parallel.mesh import make_mesh
    from probunet_tpu.parallel.multihost import MultihostPlan
    from probunet_tpu.train import create_train_state, make_probunet_train_step
    from probunet_tpu.train.state import make_optimizer

    res, batch, steps, t = 128, 8, 50, 256
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512),
                              img_resolution=(res, res), fast_attention=True)
    tx = make_optimizer(lr=1e-3, state_dtype="bfloat16")
    x0 = jnp.zeros((1, res, res, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(fill.standard_normal(s.shape).astype(np.float32) * 0.02,
                              dtype=s.dtype), va)["params"]
    state0 = jax.device_get(create_train_state(params, tx))
    hr_np = (np.random.default_rng(1).standard_normal((t, res, res, 3))
             .astype(np.float32) + 2.0)
    step = make_probunet_train_step(model, tx, 4, "perpixel",
                                    compute_dtype=jnp.bfloat16, donate=True)
    rng = jax.random.key(3, impl="unsafe_rbg")
    mesh = make_mesh((1,), ("data",))

    out = {}

    # ---- leg A: device-resident dataset tensor + gather ----
    hr = jnp.asarray(hr_np)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    state = jax.device_put(state0, jax.devices()[0])
    idx0 = jnp.arange(batch)
    state, m = step(state, hr, stats, idx0, rng)
    float(m["train_loss"])
    for w in range(5):
        state, m = step(state, hr, stats, (idx0 + w * batch) % t, rng)
    float(m["train_loss"])
    for window in range(2):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, hr, stats, (idx0 + i * batch) % t, rng)
        float(m["train_loss"])
        out["device_resident_ms"] = 1000 * (time.perf_counter() - t0) / steps
    log(f"device-resident: {out['device_resident_ms']:.1f} ms/step")
    del state, hr, stats

    # ---- legs B/C: plan-mode assembly at depth 2 and 4 ----
    class _DS:
        def __init__(s):
            s.hr_np, s.years = hr_np, [2000, 2001]

        def __len__(s):
            return t

    class _Cfg:
        batch_size = batch
        data_shards = 2
        standardization = "perpixel"
        lowres_scale = 4
        prefetch_buffer = 2

    plan = MultihostPlan(_Cfg(), _DS(), mesh)
    for depth in (2, 4):
        state = jax.device_put(state0, jax.devices()[0])
        batches = plan.epoch_batches(0)  # (nb=32, 8)
        # warmup epoch (includes the plan-shape compile on the first pass)
        for item in plan.batch_iter(hr_np, batches, plan.stats_np,
                                    buffer_size=depth):
            state, m = step(state, item["hr"], item["stats"], item["idx"], rng)
        float(m["train_loss"])
        times = []
        for window in range(4):  # 4 windows of one epoch (32 steps) each
            it = plan.batch_iter(hr_np, plan.epoch_batches(window + 1),
                                 plan.stats_np, buffer_size=depth)
            t0 = time.perf_counter()
            n = 0
            for item in it:
                state, m = step(state, item["hr"], item["stats"], item["idx"], rng)
                n += 1
            float(m["train_loss"])
            times.append(1000 * (time.perf_counter() - t0) / n)
        out[f"plan_depth{depth}_ms"] = min(times[1:])
        log(f"plan depth {depth}: windows {[f'{x:.1f}' for x in times]} ms/step")
        del state

    base = out["device_resident_ms"]
    for depth in (2, 4):
        out[f"plan_depth{depth}_overhead_pct"] = round(
            100 * (out[f"plan_depth{depth}_ms"] - base) / base, 1)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()

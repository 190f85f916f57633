#!/usr/bin/env python
"""Profile the real fused train step (bench config) with jax.profiler and print
a per-op device-time breakdown parsed via jax.profiler.ProfileData.

Usage: python scripts/profile_step.py [RES] [BATCH]
"""

import glob
import os
import sys
import time
from collections import defaultdict

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
from probunet_tpu.train import create_train_state, make_probunet_train_step
from probunet_tpu.train.state import make_optimizer

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T = 64
TRACE_STEPS = 6


def main():
    print(f"devices: {jax.devices()} res={RES} b={B}", flush=True)
    model = ProbabilisticUNet(input_channels=3, num_classes=3, latent_dim=6,
                              num_filters=(64, 128, 256, 512),
                              img_resolution=(RES, RES), fast_attention=True)
    tx = make_optimizer(lr=1e-3, state_dtype="bfloat16")
    x0 = jnp.zeros((1, RES, RES, 3))
    rngs = {"params": jax.random.key(0), "latent": jax.random.key(1),
            "dropout": jax.random.key(2)}
    va = jax.eval_shape(lambda: model.init(rngs, x0, x0, method=model.elbo))
    fill = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(fill.standard_normal(s.shape).astype(np.float32)
                              * (1.0 / np.sqrt(max(1, int(np.prod(s.shape[:-1]))))),
                              dtype=s.dtype), va)["params"]
    state = jax.device_put(create_train_state(params, tx),
                           jax.devices()[0])
    hr = jnp.asarray(np.random.default_rng(1).standard_normal((T, RES, RES, 3))
                     .astype(np.float32) + 2.0)
    stats = transforms.compute_lr_stats(hr, 4, "perpixel")
    step = make_probunet_train_step(model, tx, 4, "perpixel",
                                    compute_dtype=jnp.bfloat16, donate=True)
    rng = jax.random.key(3, impl="unsafe_rbg")
    idx0 = jnp.arange(B)

    state, m = step(state, hr, stats, idx0, rng)
    float(m["train_loss"])
    for w in range(5):
        state, m = step(state, hr, stats, (idx0 + w * B) % T, rng)
    float(m["train_loss"])
    print("warm; tracing...", flush=True)

    logdir = "/tmp/jax_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(TRACE_STEPS):
            state, m = step(state, hr, stats, (idx0 + i * B) % T, rng)
        float(m["train_loss"])

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)
    if not files:
        return
    pd = jax.profiler.ProfileData.from_file(files[0])
    for plane in pd.planes:
        lines = list(plane.lines)
        tot = defaultdict(float)
        cnt = defaultdict(int)
        span_lo, span_hi = None, None
        for line in lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns / 1e6
                tot[name] += dur
                cnt[name] += 1
        grand = sum(tot.values())
        print(f"\n=== plane: {plane.name}  lines={len(lines)} "
              f"total-event-time={grand:.2f} ms over {TRACE_STEPS} steps ===", flush=True)
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:45]
        for name, ms in top:
            print(f"  {ms/TRACE_STEPS:8.3f} ms/step  x{cnt[name]//TRACE_STEPS:<4d} {name[:110]}")


if __name__ == "__main__":
    main()

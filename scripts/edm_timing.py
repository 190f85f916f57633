#!/usr/bin/env python
"""Time the EDM denoising-score-matching train step on the current backend
(VERDICT round-4 item 2: prove 256x256 EDM training fits + runs on the chip
with --remat, now that EDMPrecond threads remat/fast_attention through).

    python scripts/edm_timing.py                 # 128x128 b8
    RES=256 BATCH=4 REMAT=1 python scripts/edm_timing.py

Honest timing (NOTES.md): value fetch inside the timed window; two windows,
report the second.
"""

import json
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

from probunet_tpu.config import Config
from probunet_tpu.data import transforms
from probunet_tpu.train import create_train_state, make_edm_train_step
from probunet_tpu.train.loop import build_edm_model
from probunet_tpu.train.state import make_optimizer


def main():
    res = int(os.environ.get("RES", "128"))
    batch = int(os.environ.get("BATCH", "8"))
    steps = int(os.environ.get("STEPS", "20"))
    remat = os.environ.get("REMAT", "0") == "1"
    fast_attn = os.environ.get("FAST_ATTN", "1") == "1"
    scale = 4

    cfg = Config(resolution=(res, res), coords=(0, res, 0, res),
                 batch_size=batch, remat=remat, fast_attention=fast_attn,
                 compute_dtype="bfloat16")
    model = build_edm_model(cfg)
    tx = make_optimizer(lr=1e-3)

    x0 = jnp.zeros((1, res, res, 3))
    va = jax.eval_shape(lambda: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, jnp.ones((1,)), condition_img=x0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, va)["params"]
    state = create_train_state(params, tx)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    t = max(int(os.environ.get("T", "32")), batch)
    hr = jnp.asarray(np.random.default_rng(0).standard_normal((t, res, res, 3)),
                     jnp.float32)
    stats = transforms.compute_lr_stats(hr, scale, "perpixel")
    step = make_edm_train_step(model, tx, scale, "perpixel",
                               compute_dtype=jnp.bfloat16, donate=True)
    idx = jnp.arange(batch) % t
    rng = jax.random.key(3)

    t0 = time.perf_counter()
    state, m = step(state, hr, stats, idx, rng)
    loss0 = float(m["train_loss"])
    compile_s = time.perf_counter() - t0
    print(f"compile+first: {compile_s:.1f} s  loss={loss0:.4f}  "
          f"params={n_params/1e6:.1f}M", flush=True)

    windows = []
    for w in range(2):
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, hr, stats, (idx + i) % t, rng)
        loss = float(m["train_loss"])  # value fetch = completion barrier
        dt = (time.perf_counter() - t0) / steps
        windows.append(dt)
        print(f"window {w}: {dt * 1e3:.1f} ms/step "
              f"({batch / dt:.1f} samples/s)  loss={loss:.4f}", flush=True)
    assert np.isfinite(loss), "training diverged"

    dt = windows[-1]
    print(json.dumps({
        "metric": "edm_train_samples_per_sec",
        "value": round(batch / dt, 2),
        "unit": f"samples/s ({res}x{res} b{batch} remat={remat} "
                f"fast_attn={fast_attn} bf16)",
        "ms_per_step": round(dt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()

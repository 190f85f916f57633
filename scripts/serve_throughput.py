#!/usr/bin/env python
"""End-to-end serving throughput on the real chip (VERDICT round-4 item 7).

Measures ``serve.downscale`` — checkpoint restore -> K-member ensemble
sampling -> physical-unit inverse -> streaming netCDF writes overlapped with
the next batch's compute — in inputs/s (days downscaled per second).

Honest-timing discipline (NOTES.md): the measured quantity is a wall-clock
window that ends only after the output file is fully written (file contents
are the completion barrier), and the run is measured TWICE — the first
window carries compile + fresh-executable warmup (the ~2-10x first-window
artifact), the second is the steady-state number reported.

    python scripts/serve_throughput.py                # 128x128, K=16, b8
    BENCH_RES=64 BENCH_K=8 python scripts/serve_throughput.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probunet_tpu.utils.hostinit import apply_platform_override

apply_platform_override()


def main():
    import jax

    from probunet_tpu.config import Config
    from probunet_tpu.data.dataset import ClimexDataset
    from probunet_tpu.serve import downscale
    from probunet_tpu.train.checkpoint import save_checkpoint
    from probunet_tpu.train.loop import build_probunet
    from probunet_tpu.train.state import make_optimizer

    res = int(os.environ.get("BENCH_RES", "128"))
    k = int(os.environ.get("BENCH_K", "16"))
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    days = int(os.environ.get("BENCH_DAYS", "64"))
    workdir = os.environ.get("BENCH_WORKDIR", "/tmp/probunet_serve_bench")
    os.makedirs(workdir, exist_ok=True)

    cfg = Config(resolution=(res, res), coords=(0, res, 0, res),
                 batch_size=batch, num_samples=k,
                 compute_dtype="bfloat16", fast_attention=True)

    # synthetic host dataset (serving reads from an in-memory ClimexDataset
    # here; the netCDF read path is measured separately in test/data benches)
    import numpy as np
    rng = np.random.default_rng(0)
    hr = (rng.standard_normal((days, res, res, 3)) + 2.0).astype(np.float32)
    ds = ClimexDataset(hr=hr, standardization=cfg.standardization,
                       lowres_scale=cfg.lowres_scale)

    # checkpoint: shape-faithful random params (serving throughput does not
    # depend on the weights' values)
    ckpt_dir = os.path.join(workdir, "ckpt")
    marker = os.path.join(ckpt_dir, f"done_{res}")
    if not os.path.exists(marker):
        from probunet_tpu.train.loop import init_probunet_state
        model = build_probunet(cfg)
        tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer)
        state = init_probunet_state(cfg, model, tx)
        save_checkpoint(ckpt_dir, jax.device_get(state))
        open(marker, "w").close()
        del state

    windows = []
    for w in range(2):
        out = os.path.join(workdir, f"out_w{w}.nc")
        if os.path.exists(out):
            os.remove(out)
        t0 = time.perf_counter()
        downscale(cfg, ckpt_dir, out, dataset=ds, num_samples=k,
                  batch_size=batch, seed=w)
        dt = time.perf_counter() - t0  # file closed = all writes landed
        windows.append(dt)
        size_mb = os.path.getsize(out) / 1e6
        print(f"window {w}: {dt:.2f} s  ({days / dt:.1f} inputs/s, "
              f"{days * k / dt:.1f} member-fields/s, {size_mb:.0f} MB written)",
              flush=True)

    dt = windows[-1]  # steady-state window (NOTES.md two-window rule)
    print(json.dumps({
        "metric": "serving_inputs_per_sec",
        "value": round(days / dt, 2),
        "unit": f"inputs/s (K={k} members, {res}x{res}, b{batch}, "
                "netCDF writes overlapped)",
        "member_fields_per_sec": round(days * k / dt, 1),
        "window_s": [round(x, 2) for x in windows],
    }))


if __name__ == "__main__":
    main()

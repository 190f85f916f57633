#!/usr/bin/env python
"""Per-conv-shape roofline at the bench config (128x128 b8, bf16).

Times every distinct conv shape of the Probabilistic U-Net (backbone +
prior/posterior + Fcomb) individually — forward and forward+backward — and
reports effective TFLOP/s vs the measured 147.6 TF/s matmul peak, to locate
exactly which shapes are responsible for the step's ~61%-of-peak efficiency.
Also A/B-tests an im2col-GEMM formulation against lax.conv per shape.

Honest timing: chained iterations with a host value fetch inside the timed
window (NOTES.md: block_until_ready is not a barrier on this runtime).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from probunet_tpu.utils.hostinit import ensure_cpu_backend

ensure_cpu_backend()  # before any backend touch (NOTES.md)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_probunet"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

PEAK_TFS = 147.6
B = int(os.environ.get("B", "8"))
N = int(os.environ.get("N", "30"))

# (tag, H_in, W_in, Cin, Cout, k, mode) mode: "same" | "down" | "up"
# Backbone at 128x128, model_channels=128, mult (1,2,3,4), num_blocks=2.
SHAPES = [
    ("enc128 first 3->128", 128, 128, 3, 128, 3, "same"),
    ("enc128 128->128", 128, 128, 128, 128, 3, "same"),
    ("enc64 down 128->128", 128, 128, 128, 128, 3, "down"),
    ("enc64 128->256", 64, 64, 128, 256, 3, "same"),
    ("enc64 256->256", 64, 64, 256, 256, 3, "same"),
    ("enc32 down 256->256", 64, 64, 256, 256, 3, "down"),
    ("enc32 256->384", 32, 32, 256, 384, 3, "same"),
    ("enc32 384->384", 32, 32, 384, 384, 3, "same"),
    ("enc16 down 384->384", 32, 32, 384, 384, 3, "down"),
    ("enc16 384->512", 16, 16, 384, 512, 3, "same"),
    ("enc16 512->512", 16, 16, 512, 512, 3, "same"),
    ("dec16 1024->512", 16, 16, 1024, 512, 3, "same"),
    ("dec16 896->512", 16, 16, 896, 512, 3, "same"),
    ("dec32 up 512->512", 16, 16, 512, 512, 3, "up"),
    ("dec32 896->384", 32, 32, 896, 384, 3, "same"),
    ("dec32 768->384", 32, 32, 768, 384, 3, "same"),
    ("dec32 640->384", 32, 32, 640, 384, 3, "same"),
    ("dec64 up 384->384", 32, 32, 384, 384, 3, "up"),
    ("dec64 640->256", 64, 64, 640, 256, 3, "same"),
    ("dec64 512->256", 64, 64, 512, 256, 3, "same"),
    ("dec64 384->256", 64, 64, 384, 256, 3, "same"),
    ("dec128 up 256->256", 64, 64, 256, 256, 3, "up"),
    ("dec128 384->128", 128, 128, 384, 128, 3, "same"),
    ("dec128 256->128", 128, 128, 256, 128, 3, "same"),
    ("out 128->3", 128, 128, 128, 3, 3, "same"),
    # prior/posterior encoder stacks (num_filters 64,128,256,512)
    ("prior 3->64 @128", 128, 128, 3, 64, 3, "same"),
    ("prior 64->128 @64", 64, 64, 64, 128, 3, "same"),
    ("prior 128->256 @32", 32, 32, 128, 256, 3, "same"),
    ("prior 256->512 @16", 16, 16, 256, 512, 3, "same"),
    # Fcomb 1x1 stack at full res
    ("fcomb 70->64 1x1", 128, 128, 70, 64, 1, "same"),
    ("fcomb 64->64 1x1", 128, 128, 64, 64, 1, "same"),
    # attention qkv/proj 1x1
    ("qkv 384->1152 1x1 @32", 32, 32, 384, 1152, 1, "same"),
    ("qkv 512->1536 1x1 @16", 16, 16, 512, 1536, 1, "same"),
]

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def conv_fn(k, mode):
    pad = k // 2

    def f(x, w):
        if mode == "same":
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), [(pad, pad)] * 2, dimension_numbers=DN)
        if mode == "down":
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), [(pad, pad)] * 2, dimension_numbers=DN)
        # up: transpose conv stride 2 (matches layers.Conv2d up path numerics
        # closely enough for timing purposes)
        return jax.lax.conv_transpose(
            x, w, (2, 2), [(pad + 1, pad + 1)] * 2, dimension_numbers=DN)

    return f


def im2col_fn(k, mode):
    """3x3 'same' conv as patch-extraction + one big GEMM."""
    pad = k // 2

    def f(x, w):
        b, h, wd, cin = x.shape
        cout = w.shape[-1]
        patches = jax.lax.conv_general_dilated_patches(
            x, (k, k), (1, 1) if mode == "same" else (2, 2),
            [(pad, pad)] * 2, dimension_numbers=DN)  # (B, H', W', k*k*Cin)
        hp, wp = patches.shape[1], patches.shape[2]
        # patches feature order is (Cin, kh, kw); reorder w to match
        wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * k * k, cout)
        out = patches.reshape(b * hp * wp, cin * k * k) @ wm
        return out.reshape(b, hp, wp, cout)

    return f


def time_one(f, x, w, n=N):
    """Chain n dependent calls inside ONE jitted program (a single dispatch);
    loop-carried scalar feedback through the WEIGHT tensor (small — the x-sized
    injection pass would dominate small convs) defeats CSE/hoisting. Barrier =
    host value fetch of the final scalar."""

    @jax.jit
    def many(x, w):
        def body(_, s):
            # nonzero multiplier: s*0 would constant-fold and let XLA hoist
            # the conv out of the loop
            y = f(x, w + s * jnp.asarray(1e-30, w.dtype))
            return y.reshape(-1)[0].astype(w.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, w.dtype))

    float(many(x, w).astype(jnp.float32))      # compile + warm
    # best of 3: the first timed call(s) of a fresh executable can carry the
    # per-process warmup artifact (NOTES.md #2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(x, w).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best / n


def main():
    print(f"devices: {jax.devices()}  b={B}  peak={PEAK_TFS} TF/s", flush=True)
    rng = np.random.default_rng(0)
    total_fwd = total_fb = 0.0
    rows = []
    for tag, h, w_, cin, cout, k, mode in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, h, w_, cin)), jnp.bfloat16)
        wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16)
        f = conv_fn(k, mode)
        # FLOPs from the ACTUAL output shape (the 'up' path's conv_transpose
        # padding yields 2H-3, not 2H; assuming 2H overstated TF/s by ~10%).
        out_shape = jax.eval_shape(f, x, wgt).shape
        ho, wo = out_shape[1], out_shape[2]
        if mode == "up":
            # transpose-conv MACs are INPUT-pixel based: each input pixel
            # contributes k*k*cout partials; an output-based k*k count would
            # overstate a stride-2 transpose by ~4x (134%-of-peak artifacts)
            flops = 2.0 * B * h * w_ * cin * cout * k * k
        else:
            flops = 2.0 * B * ho * wo * cin * cout * k * k

        def fb(x, wgt, f=f):
            # consume BOTH dx and dw so neither branch is DCE'd (flops = 3x fwd)
            def loss(args):
                return jnp.sum(f(*args).astype(jnp.float32) ** 2)
            _, g = jax.value_and_grad(loss)((x, wgt))
            return (g[1].reshape(-1)[:1].astype(jnp.float32)
                    + g[0].reshape(-1)[:1].astype(jnp.float32))

        t_f = time_one(f, x, wgt)
        t_b = time_one(fb, x, wgt)
        eff_f = flops / t_f / 1e12
        # fwd+bwd ~ 3x fwd flops (dx + dw)
        eff_b = 3 * flops / t_b / 1e12
        total_fwd += t_f
        total_fb += t_b
        line = (f"{tag:24s} fwd {t_f*1e3:6.2f} ms {eff_f:6.1f} TF/s "
                f"({100*eff_f/PEAK_TFS:4.1f}%) | fwd+bwd {t_b*1e3:6.2f} ms "
                f"{eff_b:6.1f} TF/s ({100*eff_b/PEAK_TFS:4.1f}%)")
        # im2col A/B for plain 3x3 convs
        if k == 3 and mode in ("same", "down"):
            t_i = time_one(jax.jit(im2col_fn(k, mode)), x, wgt)
            line += f" | im2col fwd {t_i*1e3:6.2f} ms ({t_f/t_i:4.2f}x)"
        print(line, flush=True)
        rows.append((tag, t_f, t_b, flops))
    print(f"\nsum of isolated fwd: {total_fwd*1e3:.1f} ms; fwd+bwd: {total_fb*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

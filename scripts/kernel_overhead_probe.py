#!/usr/bin/env python
"""Probe: is there a fixed per-kernel-invocation overhead on this runtime?

Times a fori_loop of n chained iterations where each iteration contains k
identical dependent convs. If per-iteration time scales ~k * t_conv the conv
time is real; if it's dominated by a constant independent of k or n, the cost
is loop/kernel overhead.
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

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    return jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1)] * 2,
                                        dimension_numbers=DN)


def probe(tag, h, c, n, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, h, h, c)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)

    @jax.jit
    def many(x, w):
        def body(_, s):
            wi = w + s * jnp.asarray(1e-30, w.dtype)
            y = x
            for _ in range(k):
                y = conv(y, wi)
            return y.reshape(-1)[0].astype(w.dtype)
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0, w.dtype))

    float(many(x, w).astype(jnp.float32))
    t0 = time.perf_counter()
    float(many(x, w).astype(jnp.float32))
    dt = time.perf_counter() - t0
    flops = 2.0 * 8 * h * h * c * c * 9 * n * k
    print(f"{tag:28s} n={n:3d} k={k} total {dt*1e3:8.2f} ms  per-conv "
          f"{dt/(n*k)*1e3:6.3f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # vary n at fixed k: does per-conv time change?
    for n in (10, 30, 100):
        probe("16x16 c512", 16, 512, n, 1)
    # vary k at fixed n: chained convs per iteration
    for k in (1, 2, 4, 8):
        probe("16x16 c512", 16, 512, 30, k)
    # same for a mid shape
    for k in (1, 4):
        probe("64x64 c256", 64, 256, 30, k)
    # trivial op loop: pure loop overhead
    x = jnp.ones((8, 8), jnp.bfloat16)

    @jax.jit
    def addloop(x):
        def body(_, s):
            return (x + s).reshape(-1)[0]
        return jax.lax.fori_loop(0, 100, body, jnp.asarray(0, x.dtype))

    float(addloop(x).astype(jnp.float32))
    t0 = time.perf_counter()
    float(addloop(x).astype(jnp.float32))
    print(f"pure add loop: {(time.perf_counter()-t0)/100*1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

"""Spatial resampling ops (NHWC, TPU-first).

These replace the reference's per-item CPU ``nn.AvgPool2d`` + bilinear
``nn.functional.interpolate`` pair synthesis (reference ``climex_utils.py:127-128``)
with jittable, batched XLA ops that run on device inside the train step.

Bilinear upsampling is expressed as two small dense matmuls (one per spatial
axis) with precomputed half-pixel interpolation weights — numerically identical
to ``torch.nn.functional.interpolate(mode="bilinear", align_corners=False)``
but MXU-friendly instead of gather-heavy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping k x k average pooling over NHWC (or HWC) input.

    Matches ``torch.nn.AvgPool2d(kernel_size=k)`` (reference climex_utils.py:127).
    """
    if k == 1:
        return x
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    # Reshape-mean is faster than reduce_window for non-overlapping windows and
    # lowers to pure reshapes + a reduction on TPU.
    x = x.reshape(b, h // k, k, w // k, k, c)
    out = x.mean(axis=(2, 4))
    return out[0] if squeeze else out


avg_pool_2x = functools.partial(avg_pool, k=2)


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(n_in: int, scale: int, dtype=np.float32) -> np.ndarray:
    """(n_in*scale, n_in) matrix implementing torch half-pixel bilinear upsampling."""
    n_out = n_in * scale
    w = np.zeros((n_out, n_in), dtype=dtype)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        lo = min(max(i0, 0), n_in - 1)
        hi = min(max(i0 + 1, 0), n_in - 1)
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def bilinear_upsample(x: jax.Array, scale: int) -> jax.Array:
    """Bilinear x`scale` upsampling of NHWC (or HWC) input via two matmuls.

    Bit-matches ``torch.nn.functional.interpolate(..., scale_factor=scale,
    mode="bilinear", align_corners=False)`` (reference climex_utils.py:128).
    """
    if scale == 1:
        return x
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    wh = jnp.asarray(_bilinear_matrix(h, scale), dtype=x.dtype)
    ww = jnp.asarray(_bilinear_matrix(w, scale), dtype=x.dtype)
    # out[b, i, j, c] = sum_{h,w} Wh[i,h] Ww[j,w] x[b,h,w,c].
    # HIGHEST precision: the data path must be bit-comparable to the fp32
    # torch reference even on TPU (default matmul precision is bf16-ish).
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ih,bhwc->biwc", wh, x, precision=hi)
    out = jnp.einsum("jw,biwc->bijc", ww, out, precision=hi)
    return out[0] if squeeze else out


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsampling over NHWC.

    Equivalent to the reference's ``conv_transpose2d`` with the [1,1] resample
    filter scaled by 4 (networks.py:83): the 2x2 kernel of ones exactly
    replicates each pixel into a 2x2 block.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def upsample_like_hr(lr: jax.Array, scale: int) -> jax.Array:
    """Alias used by the data path: LR (NHWC) -> HR grid via bilinear."""
    return bilinear_upsample(lr, scale)

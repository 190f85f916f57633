"""Spatial (height-axis) sharding primitives with halo exchange.

The reference never shards space — it crops 64x64 windows
(climex_utils.py:74-75). The scaling axis of this domain is *tile size*
(BASELINE config #4 calls for 256x256 multi-variable tiles); when a tile's
activations exceed one chip's HBM, the H dimension is sharded across the mesh
and convolutions exchange 1-row halos with neighbors over ICI
(``jax.lax.ppermute``) — the image analogue of sequence/context parallelism.

Building blocks (all used inside ``jax.shard_map`` over a named mesh axis):

- :func:`halo_exchange_rows` — pad local blocks with neighbor rows (zeros at
  the global edges, matching SAME-conv zero padding);
- :func:`spatial_conv3x3` — 3x3 SAME conv, stride 1 or 2, bit-equal to the
  unsharded op;
- :func:`spatial_group_norm_silu` — GroupNorm with globally-correct statistics
  (local sum/sumsq + ``psum``) fused with SiLU;
- :func:`spatial_avg_pool` / :func:`spatial_nearest_up_2x` — the local-only
  resampling ops (valid when the local height is divisible by the factor).

Equivalence to the unsharded ops is tested on the 8-virtual-device CPU mesh
(tests/test_spatial.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from probunet_tpu.ops.resample import avg_pool, nearest_upsample_2x


def halo_exchange_rows(x: jax.Array, axis_name: str, halo: int = 1) -> jax.Array:
    """Concatenate `halo` rows from each H-axis neighbor onto a local block.

    x: (B, H_loc, W, C) local shard. Returns (B, H_loc + 2*halo, W, C).
    Devices at the global edges receive zero rows (ppermute leaves unmatched
    receivers zero-filled), which reproduces SAME zero padding.
    """
    n = jax.lax.axis_size(axis_name)
    top = x[:, :halo]
    bot = x[:, -halo:]
    from_prev = jax.lax.ppermute(bot, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_next = jax.lax.ppermute(top, axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def spatial_conv3x3(
    x: jax.Array,
    w: jax.Array,
    axis_name: str,
    stride: int = 1,
    bias: jax.Array | None = None,
) -> jax.Array:
    """3x3 SAME convolution over an H-sharded NHWC block (stride 1 or 2).

    Matches the global ``conv2d_nhwc(x, w, stride, padding=1)`` exactly: the H
    axis is padded by the halo exchange (VALID locally), the W axis by zeros.
    For stride 2 the local height must be even so output rows stay aligned.
    """
    assert stride in (1, 2)
    xp = halo_exchange_rows(x, axis_name, halo=1)
    out = jax.lax.conv_general_dilated(
        xp, w,
        window_strides=(stride, stride),
        padding=[(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1)
    return out


def spatial_group_norm_silu(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    num_groups: int,
    axis_name: str,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm+SiLU over an H-sharded block with *global* statistics.

    Local fp32 sum / sum-of-squares per (batch, group), ``psum`` over the
    spatial axis, then local normalize+affine+SiLU — one collective of
    2*B*G floats per call.
    """
    b, h_loc, w_, c = x.shape
    g = num_groups
    cg = c // g
    xf = x.astype(jnp.float32).reshape(b, h_loc * w_, g, cg)
    s1 = xf.sum(axis=(1, 3))           # (B, G) local
    s2 = (xf * xf).sum(axis=(1, 3))
    s1 = jax.lax.psum(s1, axis_name)
    s2 = jax.lax.psum(s2, axis_name)
    n = h_loc * w_ * cg * jax.lax.axis_size(axis_name)
    mean = s1 / n
    var = s2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]   # (B, 1, C)
    rstd_c = jnp.repeat(rstd, cg, axis=1)[:, None, :]
    y = ((xf.reshape(b, h_loc * w_, c) - mean_c) * rstd_c
         * weight.astype(jnp.float32)[None, None, :]
         + bias.astype(jnp.float32)[None, None, :])
    out = y * jax.nn.sigmoid(y)
    return out.reshape(b, h_loc, w_, c).astype(x.dtype)


def spatial_avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping pooling is local when H_loc % k == 0 (no halo needed)."""
    assert x.shape[1] % k == 0, "local height must divide the pool factor"
    return avg_pool(x, k)


def spatial_nearest_up_2x(x: jax.Array) -> jax.Array:
    """Nearest 2x upsampling is purely local."""
    return nearest_upsample_2x(x)


def spatial_attention(x: jax.Array, axis_name: str) -> jax.Array:
    """All-gather the H-sharded block for global self-attention inputs.

    Attention lives at coarse resolutions (<=32x32, networks.py:237) where the
    full map is small; gather it, compute attention locally, and let the
    caller slice its shard back out with :func:`local_rows`."""
    return jax.lax.all_gather(x, axis_name, axis=1, tiled=True)


def local_rows(x_full: jax.Array, axis_name: str) -> jax.Array:
    """Slice this device's H-shard back out of a gathered full tensor."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    h_loc = x_full.shape[1] // n
    return jax.lax.dynamic_slice_in_dim(x_full, i * h_loc, h_loc, axis=1)

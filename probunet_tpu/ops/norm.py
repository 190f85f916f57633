"""Group normalization (NHWC, fp32 statistics).

Functional equivalent of the reference's ``GroupNorm`` wrapper around
``torch.nn.functional.group_norm`` (networks.py:95-105), including the
``num_groups = min(32, C // 4)`` rule (networks.py:98) that every U-Net block
depends on. Statistics are always computed in float32 regardless of the
activation dtype (bf16-safe), matching torch's internal fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def num_groups_for(num_channels: int, num_groups: int = 32, min_channels_per_group: int = 4) -> int:
    """Reference group-count rule (networks.py:98)."""
    return min(num_groups, num_channels // min_channels_per_group)


def group_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """NHWC group norm; normalizes each (H, W, C/G) group like torch's NCHW
    group_norm normalizes (C/G, H, W)."""
    b, h, w, c = x.shape
    g = num_groups
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_silu(x, weight, bias, num_groups, eps: float = 1e-5):
    """Fused GroupNorm + SiLU epilogue (XLA path; Pallas kernel in
    probunet_tpu.ops.pallas_gn overrides this on TPU when enabled)."""
    y = group_norm(x, weight, bias, num_groups, eps)
    return y * jax.nn.sigmoid(y)

"""Primitive layers (flax.linen, NHWC, fp32 params / caller-controlled compute dtype).

TPU-first re-design of the reference's custom primitives (networks.py:21-125):

- identical *math* and *weight-init distributions* (for torch weight-transplant
  parity tests), but NHWC layouts, HWIO conv kernels, and resampling expressed
  as reshape/mean ops instead of grouped [1,1]-filter convolutions;
- params are stored in float32 and cast to the activation dtype on use
  (mirroring torch's ``.to(x.dtype)``), so bf16 compute needs no code changes;
- attention weights are computed in float32 exactly like the reference's
  custom fp32 AttentionOp (networks.py:112-125) — jax autodiff of the fp32
  softmax reproduces its hand-written backward.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from probunet_tpu.ops.norm import group_norm as _group_norm_fn
from probunet_tpu.ops.norm import num_groups_for
from probunet_tpu.ops.resample import avg_pool, nearest_upsample_2x


class Init(NamedTuple):
    """Weight-init recipe, mirroring reference ``weight_init`` (networks.py:21-26)."""

    mode: str = "kaiming_normal"
    weight: float = 1.0
    bias: float = 0.0


#: reference networks.py:245 — main init for ADM U-Net blocks
ADM_INIT = Init(mode="kaiming_uniform", weight=math.sqrt(1.0 / 3.0), bias=math.sqrt(1.0 / 3.0))
#: reference networks.py:246 — zero-init for conv1 / out_conv / attn proj
ADM_INIT_ZERO = Init(mode="kaiming_uniform", weight=0.0, bias=0.0)


def weight_init(key: jax.Array, shape: Sequence[int], mode: str, fan_in: int, fan_out: int) -> jax.Array:
    """Reference networks.py:21-26 init distributions (fp32)."""
    if mode == "xavier_uniform":
        return np.sqrt(6 / (fan_in + fan_out)) * jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
    if mode == "xavier_normal":
        return np.sqrt(2 / (fan_in + fan_out)) * jax.random.normal(key, shape, jnp.float32)
    if mode == "kaiming_uniform":
        return np.sqrt(3 / fan_in) * jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)
    if mode == "kaiming_normal":
        return np.sqrt(1 / fan_in) * jax.random.normal(key, shape, jnp.float32)
    raise ValueError(f'Invalid init mode "{mode}"')


def torch_default_init(key: jax.Array, shape: Sequence[int], fan_in: int) -> jax.Array:
    """torch.nn.Conv2d / Linear default init: kaiming_uniform(a=sqrt(5)) =>
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias uses the same bound.

    Used by the prior/posterior encoders and Fcomb, which the reference builds
    from stock ``nn.Conv2d`` (prob_unet.py:33,41-42,92-97)."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def conv2d_nhwc(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Plain NHWC convolution with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _depthwise_filter(resample_filter: Tuple[float, ...], channels: int, dtype) -> jax.Array:
    f = jnp.asarray(resample_filter, dtype=jnp.float32)
    f = jnp.outer(f, f) / (f.sum() ** 2)
    # HWIO with feature_group_count=C: (kh, kw, 1, C)
    return jnp.tile(f[:, :, None, None], (1, 1, 1, channels)).astype(dtype)


def upsample2x(x: jax.Array, resample_filter: Tuple[float, ...] = (1, 1)) -> jax.Array:
    """Reference networks.py:83: depthwise conv_transpose(f*4, stride 2).

    For the default [1,1] filter this is exact pixel replication; general
    filters fall back to a transposed depthwise convolution."""
    if tuple(resample_filter) == (1, 1):
        return nearest_upsample_2x(x)
    c = x.shape[-1]
    f = _depthwise_filter(tuple(resample_filter), c, x.dtype) * 4.0
    f_pad = (len(resample_filter) - 1) // 2
    return jax.lax.conv_transpose(
        x, f, strides=(2, 2), padding=[(f_pad, f_pad), (f_pad, f_pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        feature_group_count=c,
    )


def downsample2x(x: jax.Array, resample_filter: Tuple[float, ...] = (1, 1)) -> jax.Array:
    """Reference networks.py:85: depthwise conv(f, stride 2) == 2x2 avg-pool
    for the default [1,1] filter."""
    if tuple(resample_filter) == (1, 1):
        return avg_pool(x, 2)
    c = x.shape[-1]
    f = _depthwise_filter(tuple(resample_filter), c, x.dtype)
    f_pad = (len(resample_filter) - 1) // 2
    return jax.lax.conv_general_dilated(
        x, f, window_strides=(2, 2), padding=[(f_pad, f_pad), (f_pad, f_pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class Conv2d(nn.Module):
    """Convolution with optional fused up/downsampling (reference networks.py:49-90).

    ``kernel=0`` means no learned weight — pure resampling (used by UNetBlock
    skip connections when channel counts match but resolution changes).
    """

    in_channels: int
    out_channels: int
    kernel: int
    use_bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Tuple[float, ...] = (1, 1)
    fused_resample: bool = False
    init: Init = Init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        w = b = None
        if k:
            fan_in = self.in_channels * k * k
            fan_out = self.out_channels * k * k
            # torch layout is OIHW; we store HWIO. Entries are iid so the init
            # distribution is identical; transplant transposes (O,I,H,W)->(H,W,I,O).
            w = self.param(
                "weight",
                lambda key: weight_init(key, (k, k, self.in_channels, self.out_channels),
                                          self.init.mode, fan_in, fan_out) * self.init.weight,
            )
            if self.use_bias:
                b = self.param(
                    "bias",
                    lambda key: weight_init(key, (self.out_channels,), self.init.mode,
                                            fan_in, fan_out) * self.init.bias,
                )
        w = w.astype(x.dtype) if w is not None else None
        b = b.astype(x.dtype) if b is not None else None
        w_pad = k // 2 if w is not None else 0
        f_pad = (len(self.resample_filter) - 1) // 2

        if self.fused_resample and self.up and w is not None:
            x = upsample2x(x, self.resample_filter)  # padding max(f_pad-w_pad,0)=0 for [1,1]
            x = conv2d_nhwc(x, w, padding=max(w_pad - f_pad, 0))
        elif self.fused_resample and self.down and w is not None:
            x = conv2d_nhwc(x, w, padding=w_pad + f_pad)
            x = downsample2x(x, self.resample_filter)
        else:
            if self.up:
                x = upsample2x(x, self.resample_filter)
            if self.down:
                x = downsample2x(x, self.resample_filter)
            if w is not None:
                x = conv2d_nhwc(x, w, padding=w_pad)
        if b is not None:
            x = x + b.reshape(1, 1, 1, -1)
        return x


class Linear(nn.Module):
    """Fully-connected layer (reference networks.py:31-44). Weight stored (in, out)."""

    in_features: int
    out_features: int
    use_bias: bool = True
    init: Init = Init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "weight",
            lambda key: weight_init(key, (self.in_features, self.out_features),
                                    self.init.mode, self.in_features, self.out_features)
            * self.init.weight,
        )
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key: weight_init(key, (self.out_features,), self.init.mode,
                                        self.in_features, self.out_features) * self.init.bias,
            )
            y = y + b.astype(x.dtype)
        return y


class GroupNorm(nn.Module):
    """Learned-affine group norm (reference networks.py:95-105)."""

    num_channels: int
    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", lambda _: jnp.ones((self.num_channels,), jnp.float32))
        bias = self.param("bias", lambda _: jnp.zeros((self.num_channels,), jnp.float32))
        g = num_groups_for(self.num_channels, self.num_groups, self.min_channels_per_group)
        return _group_norm_fn(x, weight, bias, g, self.eps)


class GroupNormSiLU(nn.Module):
    """GroupNorm immediately followed by SiLU, fused via the Pallas kernel on
    TPU (probunet_tpu.ops.pallas_gn). Param tree is identical to GroupNorm's
    (weight/bias), so torch transplant mapping is unchanged."""

    num_channels: int
    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5
    force: str = "auto"   # 'auto' | 'pallas' | 'xla' | 'interpret'

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from probunet_tpu.ops.pallas_gn import gn_silu

        weight = self.param("weight", lambda _: jnp.ones((self.num_channels,), jnp.float32))
        bias = self.param("bias", lambda _: jnp.zeros((self.num_channels,), jnp.float32))
        g = num_groups_for(self.num_channels, self.num_groups, self.min_channels_per_group)
        return gn_silu(x, weight, bias, g, self.eps, self.force)


def attention_weights(q: jax.Array, k: jax.Array, fast: bool = False) -> jax.Array:
    """softmax(Q^T K / sqrt(c)) in fp32 (reference AttentionOp, networks.py:112-125).

    q, k: (B, L, heads, c) NHWC-natural layout. Returns (B, heads, Lq, Lk) in q.dtype.

    ``fast=True`` keeps the QK^T matmul in the activation dtype (bf16 on TPU,
    ~6x MXU rate) with only the softmax in fp32 — a production fast-path;
    default is the reference's full-fp32 math. Thread the flag explicitly
    (UNet/ProbabilisticUNet ``fast_attention`` attribute); the legacy
    PROBUNET_FAST_ATTN env var is honored as a deprecated alias only.
    """
    import os

    c = k.shape[-1]
    if fast or os.environ.get("PROBUNET_FAST_ATTN"):
        w = jnp.einsum("bqhc,bkhc->bhqk", q, (k / np.sqrt(c)).astype(q.dtype))
        return jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
    qf = q.astype(jnp.float32)
    kf = (k / np.sqrt(c)).astype(jnp.float32)
    # HIGHEST is required for the math to actually BE fp32 on TPU: a default-
    # precision f32 einsum lowers to a single bf16 MXU pass there, silently
    # degrading the reference's fp32 AttentionOp contract (identical on CPU).
    w = jnp.einsum("bqhc,bkhc->bhqk", qf, kf, precision=jax.lax.Precision.HIGHEST)
    return jax.nn.softmax(w, axis=-1).astype(q.dtype)


class PositionalEmbedding(nn.Module):
    """DDPM++/ADM timestep embedding (reference networks.py:190-203)."""

    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1.0 / self.max_positions) ** freqs
        x = jnp.outer(x, freqs.astype(x.dtype))
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


class FourierEmbedding(nn.Module):
    """NCSN++ Fourier embedding (reference networks.py:208-216). ``freqs`` is a
    non-trainable buffer, stored in the 'buffers' collection."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        freqs = self.variable(
            "buffers", "freqs",
            lambda: self.scale * jax.random.normal(self.make_rng("params"), (self.num_channels // 2,)),
        ).value
        x = jnp.outer(x, (2 * jnp.pi * freqs).astype(x.dtype))
        return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)

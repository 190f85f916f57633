"""ADM-style U-Net backbone (reference networks.py:132-333), TPU-first.

Differences from the reference's design (behaviour preserved):

- **Static skip schedule.** The reference's decoder decides to concat a skip
  at runtime from a channel-count mismatch (networks.py:327-330). Here the
  whole encoder/decoder topology — including every concat — is precomputed as
  a :func:`build_unet_plan` of static block specs, so XLA traces one fixed
  graph with no shape-dependent Python control flow.
- **NHWC layouts** everywhere; channels-last concat; resampling as
  reshape/mean ops (see layers.py).
- The embedding path exists in full (positional/Fourier noise embedding,
  label and augment maps, label dropout) even though the downscaling configs
  run with ``use_diffuse=False, label_dim=0`` where it degenerates to
  ``silu(0) = 0`` (reference networks.py:303,319).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from probunet_tpu.models.layers import (
    ADM_INIT,
    ADM_INIT_ZERO,
    Conv2d,
    GroupNorm,
    GroupNormSiLU,
    Init,
    Linear,
    PositionalEmbedding,
    silu,
)


class UNetBlock(nn.Module):
    """Unified residual block with optional resampling and self-attention
    (reference networks.py:132-185)."""

    in_channels: int
    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    fast_attention: bool = False  # bf16 QK^T, fp32 softmax (see layers.attention_weights)
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1, 1)
    resample_proj: bool = False
    adaptive_scale: bool = True
    init: Init = Init()
    init_zero: Init = Init(weight=0.0)
    init_attn: Optional[Init] = None

    @property
    def heads(self) -> int:
        if not self.attention:
            return 0
        if self.num_heads is not None:
            return self.num_heads
        return self.out_channels // self.channels_per_head

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False) -> jax.Array:
        orig = x
        # norm0 -> SiLU is a fused Pallas kernel on TPU (same params as GroupNorm)
        x = Conv2d(self.in_channels, self.out_channels, 3, up=self.up, down=self.down,
                   resample_filter=self.resample_filter, init=self.init, name="conv0")(
            GroupNormSiLU(self.in_channels, eps=self.eps, name="norm0")(x))

        affine_out = self.out_channels * (2 if self.adaptive_scale else 1)
        params = Linear(self.emb_channels, affine_out, init=self.init, name="affine")(emb)
        params = params[:, None, None, :].astype(x.dtype)  # (B|1, 1, 1, C)
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)
            x = silu(shift + GroupNorm(self.out_channels, eps=self.eps, name="norm1")(x) * (scale + 1))
        else:
            x = silu(GroupNorm(self.out_channels, eps=self.eps, name="norm1")(x + params))

        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = Conv2d(self.out_channels, self.out_channels, 3, init=self.init_zero, name="conv1")(x)

        if self.out_channels != self.in_channels or self.up or self.down:
            kernel = 1 if self.resample_proj or self.out_channels != self.in_channels else 0
            orig = Conv2d(self.in_channels, self.out_channels, kernel, up=self.up,
                          down=self.down, resample_filter=self.resample_filter,
                          init=self.init, name="skip")(orig)
        x = (x + orig) * self.skip_scale

        if self.heads:
            from probunet_tpu.ops.pallas_attn import fused_attention

            b, h, w, c = x.shape
            nh = self.heads
            y = Conv2d(c, c * 3, 1, init=(self.init_attn or self.init), name="qkv")(
                GroupNorm(c, eps=self.eps, name="norm2")(x))
            # torch reshape (B, 3C, H, W) -> (B*nh, C/nh, 3, HW) factors the
            # channel axis as (head, channel, qkv); channels-last gives the
            # same factorization on the trailing axis (networks.py:180).
            y = y.reshape(b, h * w, nh, c // nh, 3)
            q, k, v = y[..., 0], y[..., 1], y[..., 2]
            # Fused Pallas attention on TPU (weights never hit HBM); identical
            # math to attention_weights + PV einsum, which remains the fallback.
            a = fused_attention(q, k, v, self.fast_attention)
            a = a.reshape(b, h, w, c)
            x = (x + Conv2d(c, c, 1, init=self.init_zero, name="proj")(a)) * self.skip_scale
        return x


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """Static description of one encoder/decoder entry."""

    name: str          # torch-compatible key, e.g. "64x64_block0"
    kind: str          # "conv" | "block"
    in_channels: int
    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    concat_skip: int = 0  # decoder: channels concatenated from the skip stack before the block


def build_unet_plan(
    img_resolution: Tuple[int, int],
    in_channels: int,
    model_channels: int,
    channel_mult: Sequence[int],
    num_blocks: int,
    attn_resolutions: Sequence[int],
    bottleneck_attention: bool = True,
) -> Tuple[List[BlockSpec], List[BlockSpec], int]:
    """Precompute the full encoder/decoder topology, replicating the reference
    constructor's channel bookkeeping (networks.py:258-298) including the
    runtime concat rule (networks.py:327-330) resolved statically.

    Returns (encoder_specs, decoder_specs, final_channels).
    """
    enc: List[BlockSpec] = []
    cout = in_channels
    for level, mult in enumerate(channel_mult):
        resx = img_resolution[0] >> level
        resy = img_resolution[1] >> level
        if level == 0:
            cin, cout = cout, model_channels * mult
            enc.append(BlockSpec(f"{resx}x{resy}_conv", "conv", cin, cout))
        else:
            enc.append(BlockSpec(f"{resx}x{resy}_down", "block", cout, cout, down=True))
        for idx in range(num_blocks):
            cin, cout = cout, model_channels * mult
            enc.append(BlockSpec(f"{resx}x{resy}_block{idx}", "block", cin, cout,
                                 attention=(resx in attn_resolutions)))
    skips = [s.out_channels for s in enc]

    dec: List[BlockSpec] = []
    cur = cout
    for level, mult in reversed(list(enumerate(channel_mult))):
        resx = img_resolution[0] >> level
        resy = img_resolution[1] >> level
        if level == len(channel_mult) - 1:
            dec.append(BlockSpec(f"{resx}x{resy}_in0", "block", cout, cout,
                                 attention=bottleneck_attention))
            dec.append(BlockSpec(f"{resx}x{resy}_in1", "block", cout, cout))
        else:
            dec.append(BlockSpec(f"{resx}x{resy}_up", "block", cout, cout, up=True))
        for idx in range(num_blocks + 1):
            cin = cout + skips.pop()
            cout = model_channels * mult
            dec.append(BlockSpec(f"{resx}x{resy}_block{idx}", "block", cin, cout,
                                 attention=(resx in attn_resolutions)))
    # Resolve concat amounts statically by replaying the forward rule.
    resolved: List[BlockSpec] = []
    for spec in dec:
        concat = spec.in_channels - cur if spec.in_channels != cur else 0
        assert concat >= 0, "decoder channel bookkeeping mismatch"
        resolved.append(dataclasses.replace(spec, concat_skip=concat))
        cur = spec.out_channels
    return enc, resolved, cout


class UNet(nn.Module):
    """Reimplementation of the ADM architecture (reference networks.py:224-333)."""

    img_resolution: Tuple[int, int]
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    use_diffuse: bool = True
    # networks.py:284-285 always enables attention in the bottleneck in0 block;
    # baseline/deterministic_unet.py:283-284 disables it — hence the knob.
    bottleneck_attention: bool = True
    fast_attention: bool = False  # bf16 QK^T path, threaded to every attention block
    remat: bool = False  # jax.checkpoint each block (memory/recompute trade)

    @property
    def emb_channels(self) -> int:
        return self.model_channels * self.channel_mult_emb

    def plan(self):
        return build_unet_plan(self.img_resolution, self.in_channels, self.model_channels,
                               self.channel_mult, self.num_blocks, self.attn_resolutions,
                               self.bottleneck_attention)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        noise_labels: Optional[jax.Array] = None,
        class_labels: Optional[jax.Array] = None,
        augment_labels: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        init = ADM_INIT
        init_zero = ADM_INIT_ZERO
        emb_channels = self.emb_channels
        block_kw = dict(emb_channels=emb_channels, channels_per_head=64,
                        fast_attention=self.fast_attention,
                        dropout=self.dropout, init=init, init_zero=init_zero)
        enc_specs, dec_specs, final_c = self.plan()

        # ---- Mapping (reference networks.py:302-319) ----
        emb = jnp.zeros((1, emb_channels), dtype=x.dtype)
        if self.label_dim:
            tmp = class_labels.astype(x.dtype)
            if train and self.label_dropout:
                keep = (jax.random.uniform(self.make_rng("label_dropout"), (x.shape[0], 1))
                        >= self.label_dropout).astype(tmp.dtype)
                tmp = tmp * keep
            emb = Linear(self.label_dim, emb_channels, use_bias=False,
                         init=Init("kaiming_normal", float(np.sqrt(self.label_dim)), 0.0),
                         name="map_label")(tmp)
        if self.use_diffuse:
            emb_n = PositionalEmbedding(self.model_channels, name="map_noise")(noise_labels)
            emb_n = silu(Linear(self.model_channels, emb_channels, init=init, name="map_layer0")(emb_n))
            emb_n = Linear(emb_channels, emb_channels, init=init, name="map_layer1")(emb_n)
            emb = emb + emb_n
        else:
            # The reference constructs map_layer0/1 unconditionally
            # (networks.py:252-253); call them on zeros (result unused, DCE'd)
            # purely to materialize the params for count/transplant parity.
            z = Linear(self.model_channels, emb_channels, init=init, name="map_layer0")(
                jnp.zeros((1, self.model_channels), x.dtype))
            Linear(emb_channels, emb_channels, init=init, name="map_layer1")(z)
        if self.augment_dim and augment_labels is not None:
            emb = emb + Linear(self.augment_dim, self.model_channels, use_bias=False,
                               init=init_zero, name="map_augment")(augment_labels)
        emb = silu(emb)

        block_cls = UNetBlock
        if self.remat:
            # Rematerialize each residual block on the backward pass: activations
            # are recomputed instead of stored, trading ~1 extra forward for a
            # large cut in HBM live memory (enables 256x256+ tiles).
            # static_argnums: (self, x, emb, train) -> train at index 3.
            block_cls = nn.remat(UNetBlock, static_argnums=(3,))

        def make_block(spec: BlockSpec, prefix: str):
            if spec.kind == "conv":
                return Conv2d(spec.in_channels, spec.out_channels, 3, init=init,
                              name=f"{prefix}_{spec.name}")
            blk = block_cls(spec.in_channels, spec.out_channels, up=spec.up, down=spec.down,
                            attention=spec.attention, name=f"{prefix}_{spec.name}", **block_kw)
            return blk

        # ---- Encoder (reference networks.py:321-324) ----
        skips = []
        for spec in enc_specs:
            blk = make_block(spec, "enc")
            if spec.kind == "conv":
                x = blk(x)
            else:
                x = blk(x, emb, train)
            skips.append(x)

        # ---- Decoder with static concat schedule (networks.py:326-331) ----
        for spec in dec_specs:
            if spec.concat_skip:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = make_block(spec, "dec")(x, emb, train)

        x = Conv2d(final_c, self.out_channels, 3, init=init_zero, name="out_conv")(
            GroupNormSiLU(final_c, name="out_norm")(x))
        return x

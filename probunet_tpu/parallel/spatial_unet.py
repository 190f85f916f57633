"""Spatially-sharded Probabilistic U-Net forward (H-axis model parallelism).

Runs the *same parameters* produced by ``models.UNet`` / ``ProbabilisticUNet``
with the height dimension sharded across the mesh: convolutions exchange
1-row halos over ICI, GroupNorm statistics are psum'd, resampling is local,
and self-attention (which lives at coarse <=32x32 resolutions) all-gathers the
small feature map, computes locally and slices its shard back. This is how
tiles beyond one chip's HBM (full-domain 280x280+, BASELINE config #4 and
beyond) are served/evaluated without changing a single weight.

Implemented as pure functions over the flax param pytree (no module
re-definition), driven by the same static :func:`build_unet_plan`, and
verified equal to the unsharded forward in tests/test_spatial_unet.py.

Supports the downscaling configuration (use_diffuse=False, label_dim=0, where
the embedding is silu(0)=0 and each block's adaptive scale/shift reduces to
the affine bias — reference networks.py:303,319). Deterministic mode serves
inference/eval; :func:`spatial_probunet_elbo` adds posterior sampling +
per-shard dropout + optional per-block remat, and is the loss body of the
spatially-sharded TRAINING step (``parallel.spatial_train``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from probunet_tpu.models.unet import build_unet_plan
from probunet_tpu.ops.norm import num_groups_for
from probunet_tpu.parallel.spatial import (
    halo_exchange_rows,
    local_rows,
    spatial_attention,
    spatial_avg_pool,
    spatial_nearest_up_2x,
)


def _conv(p: Dict, x: jax.Array, axis_name, padding: int = 1) -> jax.Array:
    """SAME conv from a flax Conv2d param dict; 3x3 uses halo exchange, 1x1 is
    local. ``axis_name=None`` means x is a full (gathered) tensor: plain conv."""
    if axis_name is None:
        return _conv_full(p, x)
    w = p["weight"].astype(x.dtype)
    k = w.shape[0]
    if k == 1:
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        xp = halo_exchange_rows(x, axis_name, halo=k // 2)
        out = jax.lax.conv_general_dilated(
            xp, w, (1, 1), [(0, 0), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype).reshape(1, 1, 1, -1)
    return out


def _gn(p: Dict, x: jax.Array, axis_name: str, eps: float = 1e-5) -> jax.Array:
    """GroupNorm with global (psum'd) statistics from a flax GroupNorm dict."""
    c = x.shape[-1]
    g = num_groups_for(c)
    b, h_loc, w_, _ = x.shape
    cg = c // g
    xf = x.astype(jnp.float32).reshape(b, h_loc * w_, g, cg)
    s1 = jax.lax.psum(xf.sum(axis=(1, 3)), axis_name)
    s2 = jax.lax.psum((xf * xf).sum(axis=(1, 3)), axis_name)
    n = h_loc * w_ * cg * jax.lax.axis_size(axis_name)
    mean = s1 / n
    var = s2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)[:, None, :]
    rstd_c = jnp.repeat(rstd, cg, axis=1)[:, None, :]
    y = ((xf.reshape(b, h_loc * w_, c) - mean_c) * rstd_c
         * p["weight"].astype(jnp.float32)[None, None, :]
         + p["bias"].astype(jnp.float32)[None, None, :])
    return y.reshape(b, h_loc, w_, c).astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dropout(x: jax.Array, rate: float, rng: jax.Array | None,
             axis_name: str) -> jax.Array:
    """Inverted dropout with a per-shard mask (rng folded with the device's
    axis index, so H-shards draw independent masks)."""
    if rate <= 0.0 or rng is None:
        return x
    r = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    keep = jax.random.bernoulli(r, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _block(p: Dict, x: jax.Array, spec, axis_name: str,
           dropout: float = 0.0, dropout_rng: jax.Array | None = None) -> jax.Array:
    """Spatial UNetBlock forward (reference networks.py:164-185) with the
    zero-embedding reduction: affine(emb=0) == affine bias."""
    orig = x
    h = _silu(_gn(p["norm0"], x, axis_name))
    if spec.up:
        h = spatial_nearest_up_2x(h)
    if spec.down:
        h = spatial_avg_pool(h, 2)
    h = _conv(p["conv0"], h, axis_name)

    affine_bias = p["affine"]["bias"].astype(h.dtype)   # (2*C,)
    scale, shift = jnp.split(affine_bias.reshape(1, 1, 1, -1), 2, axis=-1)
    h = _silu(shift + _gn(p["norm1"], h, axis_name) * (scale + 1))
    h = _dropout(h, dropout, dropout_rng, axis_name)
    h = _conv(p["conv1"], h, axis_name)

    if "skip" in p:
        s = orig
        if spec.up:
            s = spatial_nearest_up_2x(s)
        if spec.down:
            s = spatial_avg_pool(s, 2)
        s = _conv(p["skip"], s, axis_name, padding=0)
        orig = s
    elif spec.up:
        orig = spatial_nearest_up_2x(orig)
    elif spec.down:
        orig = spatial_avg_pool(orig, 2)
    x = h + orig

    # heads = C // 64 (networks.py:143); attention is a no-op when heads == 0,
    # in which case the flax module created no qkv/proj params either.
    if spec.attention and "qkv" in p:
        from probunet_tpu.ops.pallas_attn import fused_attention

        # gather the (small, coarse) map; full attention locally; slice back
        full = spatial_attention(x, axis_name)                 # (B, H, W, C)
        bq, hh, ww, c = full.shape
        nh = c // 64
        y = _conv(p["qkv"], _gn_full(p["norm2"], full), axis_name=None)
        y = y.reshape(bq, hh * ww, nh, c // nh, 3)
        q, k, v = y[..., 0], y[..., 1], y[..., 2]
        a = fused_attention(q, k, v).reshape(bq, hh, ww, c)
        proj = _conv(p["proj"], a, axis_name=None)
        x = x + local_rows(proj, axis_name)
    return x


def _gn_full(p: Dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Plain (unsharded) group norm for gathered full tensors."""
    from probunet_tpu.ops.norm import group_norm
    c = x.shape[-1]
    return group_norm(x, p["weight"], p["bias"], num_groups_for(c), eps)


def _conv_full(p: Dict, x: jax.Array) -> jax.Array:
    from probunet_tpu.models.layers import conv2d_nhwc
    w = p["weight"].astype(x.dtype)
    out = conv2d_nhwc(x, w, padding=w.shape[0] // 2)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype).reshape(1, 1, 1, -1)
    return out


def spatial_unet_forward(
    params: Dict,
    x: jax.Array,
    img_resolution: Tuple[int, int],
    in_channels: int,
    axis_name: str,
    model_channels: int = 128,
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4),
    num_blocks: int = 2,
    attn_resolutions: Tuple[int, ...] = (32, 16, 8),
    bottleneck_attention: bool = True,
    dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
) -> jax.Array:
    """H-sharded equivalent of ``UNet.__call__`` (use_diffuse=False,
    label_dim=0). ``x`` is the local (B, H_loc, W, C) shard; ``img_resolution``
    is the GLOBAL resolution (drives the static plan). ``dropout``/``remat``
    make this a training-capable forward: per-shard dropout masks, and
    per-block rematerialization to hold 256x256+ activations across chips."""
    enc_specs, dec_specs, final_c = build_unet_plan(
        img_resolution, in_channels, model_channels, channel_mult, num_blocks,
        attn_resolutions, bottleneck_attention)

    block = _block
    if remat:
        block = jax.checkpoint(_block, static_argnums=(2, 3, 4))

    def block_rng(i):
        return None if dropout_rng is None else jax.random.fold_in(dropout_rng, i)

    bi = 0
    skips = []
    for spec in enc_specs:
        p = params[f"enc_{spec.name}"]
        if spec.kind == "conv":
            x = _conv(p, x, axis_name)
        else:
            x = block(p, x, spec, axis_name, dropout, block_rng(bi))
            bi += 1
        skips.append(x)
    for spec in dec_specs:
        if spec.concat_skip:
            x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = block(params[f"dec_{spec.name}"], x, spec, axis_name, dropout, block_rng(bi))
        bi += 1
    x = _conv(params["out_conv"], _silu(_gn(params["out_norm"], x, axis_name)), axis_name)
    return x


def spatial_gaussian_forward(params: Dict, x: jax.Array, num_filters, axis_name: str):
    """H-sharded AxisAlignedConvGaussian: halo convs + local pools + psum'd
    global mean pool -> (mu, log_sigma) identical on every device."""
    h = x
    for i, _ in enumerate(num_filters):
        h = jax.nn.relu(_conv(params[f"enc_{i}"], h, axis_name))
        h = spatial_avg_pool(h, 2)
    # global average pool over (H, W): local mean scaled by local fraction, psum
    local_sum = h.mean(axis=(1, 2), keepdims=True) / jax.lax.axis_size(axis_name)
    pooled = jax.lax.psum(local_sum, axis_name)          # (B, 1, 1, C)
    mu = _conv_full(params["conv_mu"], pooled)[:, 0, 0, :]
    log_sigma = _conv_full(params["conv_log_sigma"], pooled)[:, 0, 0, :]
    return mu.astype(jnp.float32), log_sigma.astype(jnp.float32)


def spatial_fcomb(fc: Dict, feats: jax.Array, z: jax.Array) -> jax.Array:
    """Fcomb on a local H-shard: 1x1 convs are purely local (prob_unet.py:80-121)."""
    b, h_loc, w_, _ = feats.shape
    zmap = jnp.broadcast_to(z[:, None, None, :].astype(feats.dtype),
                            (b, h_loc, w_, z.shape[-1]))
    h = jnp.concatenate([feats, zmap], axis=-1)
    h = jax.nn.relu(_conv_full(fc["layer0"], h))
    h = jax.nn.relu(_conv_full(fc["layer1"], h))
    return _conv_full(fc["layer2"], h)


def spatial_probunet_elbo(
    params: Dict,
    x: jax.Array,
    y: jax.Array,
    img_resolution: Tuple[int, int],
    axis_name: str,
    beta=1.0,
    z: jax.Array | None = None,
    rng: jax.Array | None = None,
    num_filters: Tuple[int, ...] = (64, 128, 256, 512),
    model_channels: int = 128,
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4),
    num_blocks: int = 2,
    attn_resolutions: Tuple[int, ...] = (32, 16, 8),
    dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
    batch_axis_name: str | None = None,
):
    """H-sharded ELBO (prob_unet.py:198-234 math) — the training loss body.

    ``x``/``y`` are local (B, H_loc, W, C) shards inside a ``shard_map`` over
    ``axis_name``. The posterior draw ``z`` is replicated over the SPACE axis
    (mu/log_sigma come out of psum'd global pools, and ``rng`` is the same on
    every device); ``recon`` is the psum of local sum-squared errors, so all
    three returned scalars are device-invariant — safe for ``out_specs=P()``
    and for taking ``jax.grad`` OUTSIDE the shard_map (the replicated-input
    transpose psums the per-device param cotangents). Supply an explicit ``z``
    for parity tests (mirrors ``ProbabilisticUNet.elbo_with_z``).

    2D (data x spatial) composition: with ``batch_axis_name`` set, the batch
    axis of x/y is ALSO sharded (each device holds a (B_loc, H_loc, W, C)
    tile of the global batch). Every per-sample computation is unchanged —
    conv halos/GroupNorm/global pools only ever reduce over space — so the
    only deltas are (a) the sum-reduction scalars additionally psum over the
    batch axis, and (b) the latent/dropout rngs fold in the batch-shard index
    so different global samples draw independent noise.
    """
    from probunet_tpu.ops.distributions import DiagGaussian, kl_diag_gaussian

    if batch_axis_name is not None:
        bi = jax.lax.axis_index(batch_axis_name)
        if rng is not None:
            rng = jax.random.fold_in(rng, bi)
        if dropout_rng is not None:
            dropout_rng = jax.random.fold_in(dropout_rng, bi)
    feats = spatial_unet_forward(
        params["unet"], x, img_resolution, x.shape[-1], axis_name,
        model_channels=model_channels, channel_mult=channel_mult,
        num_blocks=num_blocks, attn_resolutions=attn_resolutions,
        dropout=dropout, dropout_rng=dropout_rng, remat=remat)
    pr_mu, pr_ls = spatial_gaussian_forward(params["prior"], x, num_filters, axis_name)
    po_mu, po_ls = spatial_gaussian_forward(
        params["posterior"], jnp.concatenate([x, y], axis=-1), num_filters, axis_name)
    prior = DiagGaussian(pr_mu, pr_ls)
    posterior = DiagGaussian(po_mu, po_ls)
    if z is None:
        z = posterior.rsample(rng)          # same rng across space -> replicated z
    out = spatial_fcomb(params["fcomb"], feats, z)
    diff = out.astype(jnp.float32) - y.astype(jnp.float32)
    axes = (axis_name,) if batch_axis_name is None else (axis_name, batch_axis_name)
    recon = jax.lax.psum(jnp.sum(jnp.square(diff)), axes)
    kl = kl_diag_gaussian(posterior, prior).sum()
    if batch_axis_name is not None:
        kl = jax.lax.psum(kl, batch_axis_name)
    total = recon + beta * kl
    return total, recon, kl


def spatial_probunet_forward(
    params: Dict,
    x: jax.Array,
    z: jax.Array,
    img_resolution: Tuple[int, int],
    axis_name: str,
    num_filters: Tuple[int, ...] = (64, 128, 256, 512),
    model_channels: int = 128,
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4),
    num_blocks: int = 2,
    attn_resolutions: Tuple[int, ...] = (32, 16, 8),
) -> jax.Array:
    """H-sharded deterministic decode: UNet features + Fcomb with a given z
    (the ensemble tail vmaps/batches over z outside)."""
    feats = spatial_unet_forward(
        params["unet"], x, img_resolution, x.shape[-1], axis_name,
        model_channels=model_channels, channel_mult=channel_mult,
        num_blocks=num_blocks, attn_resolutions=attn_resolutions)
    return spatial_fcomb(params["fcomb"], feats, z)

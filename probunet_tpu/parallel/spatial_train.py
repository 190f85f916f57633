"""Spatially-sharded TRAINING step (H-axis model parallelism, trainable).

Round 1 limited spatial sharding to inference; this module makes the 256x256+
tile configuration (BASELINE config #4) *trainable across chips*: the full
ELBO — halo-exchange convs, psum'd GroupNorm statistics, gathered coarse
attention, posterior sampling, per-shard dropout, optional per-block remat —
runs inside one ``shard_map`` whose scalar outputs are device-invariant, and
``jax.grad`` is taken OUTSIDE it. JAX's replicated-input transpose then psums
the per-device parameter cotangents automatically (the gradient all-reduce
rides ICI like any DP step), so the update math is identical to the unsharded
fused step (verified in tests/test_spatial_train.py).

Batch layout: inputs arrive as full (B, H, W, C) arrays sharded
``P(None, axis)`` over H — exactly the layout ``put_spatial`` produces.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from probunet_tpu.parallel.spatial_unet import spatial_probunet_elbo
from probunet_tpu.train.state import TrainState


def put_spatial(x: jax.Array, mesh, axis_name: str = "space") -> jax.Array:
    """Device-put a (B, H, ...) array H-sharded over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))


def make_spatial_probunet_train_step(
    model,
    tx,
    mesh,
    axis_name: str = "space",
    beta_fn: Optional[Callable] = None,
    compute_dtype=jnp.float32,
    donate: bool = True,
    remat: bool = True,
    accum: int = 1,
):
    """Returns step(state, x, y, rng) -> (state, metrics) where x/y are
    H-sharded (B, H, W, C) standardized input/target batches.

    ``model`` is the flax ProbabilisticUNet the parameters came from — only
    its static architecture fields are read (the forward runs through the
    functional spatial kernels). Pair synthesis happens upstream (the HR
    tensor for tiles this large streams from host), unlike the fused DP step
    which gathers from a device-resident dataset tensor.
    """
    beta_fn = beta_fn or (lambda step: jnp.float32(model.beta))
    accum = max(1, int(accum))
    arch = dict(
        img_resolution=tuple(model.img_resolution),
        num_filters=tuple(model.num_filters),
        model_channels=model.model_channels,
        channel_mult=tuple(model.channel_mult),
        num_blocks=model.num_blocks,
        attn_resolutions=tuple(model.attn_resolutions),
    )
    dropout = float(model.dropout)

    def sharded_elbo(params, x, y, rng, beta):
        def body(params, xl, yl, rng, beta):
            r_latent, r_drop = jax.random.split(rng)
            return spatial_probunet_elbo(
                params, xl.astype(compute_dtype), yl.astype(compute_dtype),
                axis_name=axis_name, beta=beta, rng=r_latent,
                dropout=dropout, dropout_rng=r_drop, remat=remat, **arch)

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(), P(None, axis_name), P(None, axis_name), P(), P()),
                       out_specs=(P(), P(), P()))
        return fn(params, x, y, rng, beta)

    def step(state: TrainState, x, y, rng):
        beta = beta_fn(state.step // accum)
        r = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            total, recon, kl = sharded_elbo(params, x, y, r, beta)
            return total, (recon, kl)

        (total, (recon, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), state.params, updates)
        metrics = {"train_loss": total, "recon_loss": recon, "kl_div": kl, "beta": beta,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_spatial_eval_elbo(model, mesh, axis_name: str = "space",
                           compute_dtype=jnp.float32):
    """Deterministic-given-rng sharded ELBO (dropout off) for eval/validation
    at tile sizes beyond one chip."""
    arch = dict(
        img_resolution=tuple(model.img_resolution),
        num_filters=tuple(model.num_filters),
        model_channels=model.model_channels,
        channel_mult=tuple(model.channel_mult),
        num_blocks=model.num_blocks,
        attn_resolutions=tuple(model.attn_resolutions),
    )

    def fn(params, x, y, rng, beta):
        def body(params, xl, yl, rng, beta):
            return spatial_probunet_elbo(
                params, xl.astype(compute_dtype), yl.astype(compute_dtype),
                axis_name=axis_name, beta=beta, rng=rng, **arch)

        sm = shard_map(body, mesh=mesh,
                       in_specs=(P(), P(None, axis_name), P(None, axis_name), P(), P()),
                       out_specs=(P(), P(), P()))
        total, recon, kl = sm(params, x, y, rng, beta)
        return {"val_loss": total, "val_recon_loss": recon, "val_kl_div": kl}

    return jax.jit(fn)

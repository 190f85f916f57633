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
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map_unchecked(*args, **kw):
    """shard_map with varying-mesh-axes checking OFF — use ONLY for bodies
    that call the Pallas kernels (fused attention), whose pallas_call
    out_shapes carry no `vma` and are rejected by the checker on TPU.
    Any new spatial code without Pallas calls should use plain
    ``jax.shard_map`` so it keeps the replication checker. Gradient
    correctness for the unchecked bodies here is covered by
    tests/test_spatial_train.py's sharded==unsharded grad parity."""
    try:
        return _shard_map(*args, check_vma=False, **kw)
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        return _shard_map(*args, check_rep=False, **kw)


# Back-compat alias (tests import it under this name); prefer the explicit
# `shard_map_unchecked` in new code so the disabled checker is visible.
shard_map = shard_map_unchecked

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

        # unchecked: body reaches fused_attention (Pallas) via spatial_unet
        fn = shard_map_unchecked(
            body, mesh=mesh,
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


def train_probunet_spatial(cfg, datasets=None):
    """Experiment driver for tiles beyond one chip's HBM: the height axis is
    sharded across ALL devices (model parallelism), batches stream from host,
    and every train/eval step is the shard_map'd ELBO. The counterpart of
    ``train.loop.train_probunet`` for ``--parallel_mode spatial``.

    Plot generation is intentionally not wired here (an H-gathered ensemble
    decode exists in ``spatial_unet.spatial_probunet_forward`` for offline
    use); metrics/checkpoints match the DP loop's contract.
    """
    import os

    import numpy as np

    from probunet_tpu.data import transforms
    from probunet_tpu.data.pipeline import compute_lr_stats_streaming
    from probunet_tpu.parallel import make_mesh
    from probunet_tpu.train.checkpoint import save_checkpoint
    from probunet_tpu.train.loop import build_probunet, init_probunet_state, load_datasets
    from probunet_tpu.train.state import make_optimizer
    from probunet_tpu.train.steps import beta_schedule
    from probunet_tpu.utils.logging import MetricLogger, StepTimer, progress

    axis = "space"
    mesh = make_mesh((-1,), (axis,))
    datasets = datasets or load_datasets(cfg)
    ds_train, ds_val = datasets["train"], datasets["val"]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    model = build_probunet(cfg)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer,
                        state_dtype=cfg.opt_state_dtype)
    state = init_probunet_state(cfg, model, tx)
    if cfg.resume:
        from probunet_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(cfg.resume, state)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    beta_fn = beta_schedule(cfg.beta_schedule, cfg.beta, cfg.beta_warmup_steps)
    step = make_spatial_probunet_train_step(model, tx, mesh, axis, beta_fn,
                                            dtype, donate=cfg.donate_state,
                                            remat=cfg.remat, accum=cfg.accum)
    eval_fn = make_spatial_eval_elbo(model, mesh, axis, dtype)

    # Host-resident data (the whole point of this mode); global stats streamed.
    stats_np = compute_lr_stats_streaming(ds_train.hr_np, cfg.lowres_scale,
                                          cfg.standardization)
    pair_fn = jax.jit(lambda hr, sl: transforms.make_pair(
        hr, cfg.lowres_scale, cfg.standardization, sl))

    def batch_xy(ds, idx, stats):
        hr = jnp.asarray(ds.hr_np[idx])
        sl = None
        if stats is not None:
            sl = transforms.slice_stats(
                tuple(jnp.asarray(s) for s in stats), cfg.standardization,
                jnp.asarray(idx))
        pair = pair_fn(hr, sl)
        return put_spatial(pair["inputs"], mesh, axis), put_spatial(pair["targets"], mesh, axis)

    stats_val_np = compute_lr_stats_streaming(ds_val.hr_np, cfg.lowres_scale,
                                              cfg.standardization)
    os.makedirs(cfg.plotdir, exist_ok=True)
    logger = MetricLogger(cfg.metrics_path or os.path.join(cfg.plotdir, "metrics.jsonl"),
                          use_wandb=cfg.wandb)
    timer = StepTimer(cfg.profile_dir)
    rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
    eval_rng = jax.random.key(cfg.eval_seed, impl=cfg.rng_impl)

    tr_losses, val_losses = [], []
    step_count = 0
    for epoch in range(1, cfg.num_epochs + 1):
        running = []
        timer.reset()
        batches = ds_train.epoch_indices(cfg.seed + epoch, cfg.batch_size)
        for bi in progress(range(batches.shape[0]),
                           desc=f"Train(spatial) :: Epoch: {epoch}/{cfg.num_epochs}"):
            x, y = batch_xy(ds_train, batches[bi], stats_np)
            state, metrics = step(state, x, y, rng)
            step_count += 1
            timer.tick(cfg.batch_size)
            running.append(metrics["train_loss"])
            if step_count % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["samples_per_sec"] = timer.rate()
                logger.log(m, step=step_count)
        tr_losses.append(float(jnp.mean(jnp.stack(running))))

        vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
        vloss = []
        for bi in range(vbatches.shape[0]):
            x, y = batch_xy(ds_val, vbatches[bi], stats_val_np)
            m = eval_fn(state.params, x, y, jax.random.fold_in(eval_rng, bi),
                        jnp.float32(cfg.beta))
            vloss.append(m["val_loss"])
        val_losses.append(float(jnp.mean(jnp.stack(vloss))))
        logger.log({"epoch": epoch, "epoch_train_loss": tr_losses[-1],
                    "val_loss": val_losses[-1]}, step=step_count)
        save_checkpoint(os.path.join(cfg.checkpoints_dir, "probunet"),
                        jax.device_get(state))
    logger.close()
    return {"state": state, "tr_losses": tr_losses, "val_losses": val_losses,
            "samples_per_sec": timer.rate()}


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

        # unchecked: body reaches fused_attention (Pallas) via spatial_unet
        sm = shard_map_unchecked(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis_name), P(None, axis_name), P(), P()),
            out_specs=(P(), P(), P()))
        total, recon, kl = sm(params, x, y, rng, beta)
        return {"val_loss": total, "val_recon_loss": recon, "val_kl_div": kl}

    return jax.jit(fn)

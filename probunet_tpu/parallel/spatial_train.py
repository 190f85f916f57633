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
    tests/test_spatial_train.py's sharded==unsharded grad parity.

    (There is deliberately NO ``shard_map`` alias for this function: every
    call site must spell out that the checker is off.)"""
    try:
        return _shard_map(*args, check_vma=False, **kw)
    except TypeError:  # pragma: no cover - older jax spells it check_rep
        return _shard_map(*args, check_rep=False, **kw)

from probunet_tpu.parallel.spatial_unet import spatial_probunet_elbo
from probunet_tpu.train.state import TrainState


def put_spatial(x: jax.Array, mesh, axis_name: str = "space",
                batch_axis_name: str | None = None) -> jax.Array:
    """Device-put a (B, H, ...) array H-sharded over the mesh axis; with
    ``batch_axis_name`` the batch axis is sharded too (2D data x spatial)."""
    return jax.device_put(x, NamedSharding(mesh, P(batch_axis_name, axis_name)))


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
    batch_axis_name: Optional[str] = None,
):
    """Returns step(state, x, y, rng) -> (state, metrics) where x/y are
    H-sharded (B, H, W, C) standardized input/target batches.

    ``model`` is the flax ProbabilisticUNet the parameters came from — only
    its static architecture fields are read (the forward runs through the
    functional spatial kernels). Pair synthesis happens upstream (the HR
    tensor for tiles this large streams from host), unlike the fused DP step
    which gathers from a device-resident dataset tensor.

    ``batch_axis_name`` composes DATA parallelism with the spatial sharding
    (2D mesh, e.g. ``make_mesh((dp, -1), ("data", "space"))``): the batch
    axis shards over it, the ELBO scalars psum over both axes, and the
    replicated-params transpose all-reduces the gradients over the WHOLE
    mesh — dp x sp scaling in one shard_map.
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
    xy_spec = P(batch_axis_name, axis_name)

    def sharded_elbo(params, x, y, rng, beta):
        def body(params, xl, yl, rng, beta):
            r_latent, r_drop = jax.random.split(rng)
            return spatial_probunet_elbo(
                params, xl.astype(compute_dtype), yl.astype(compute_dtype),
                axis_name=axis_name, beta=beta, rng=r_latent,
                dropout=dropout, dropout_rng=r_drop, remat=remat,
                batch_axis_name=batch_axis_name, **arch)

        # unchecked: body reaches fused_attention (Pallas) via spatial_unet
        fn = shard_map_unchecked(
            body, mesh=mesh,
            in_specs=(P(), xy_spec, xy_spec, P(), P()),
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


def make_spatial_sample_fn(model, mesh, axis_name: str = "space",
                           num_samples: int = 3, compute_dtype=jnp.float32):
    """H-sharded ensemble decode: the UNet features are computed ONCE per
    input, then K prior draws run through the (cheap, 1x1-conv) Fcomb tail —
    the same features-reuse idiom as ``train.steps.make_sample_fn`` (the
    reference recomputes the full UNet per draw,
    train_prob_unet_model.py:179-182). Returns fn(params, x, rng) ->
    (B, K, H, W, C) float32 standardized residual draws, H-sharded."""
    arch = dict(
        img_resolution=tuple(model.img_resolution),
        model_channels=model.model_channels,
        channel_mult=tuple(model.channel_mult),
        num_blocks=model.num_blocks,
        attn_resolutions=tuple(model.attn_resolutions),
    )
    num_filters = tuple(model.num_filters)

    def fn(params, x, rng):
        def body(params, xl, rng):
            from probunet_tpu.ops.distributions import DiagGaussian
            from probunet_tpu.parallel.spatial_unet import (
                spatial_fcomb, spatial_gaussian_forward, spatial_unet_forward)

            xl = xl.astype(compute_dtype)
            feats = spatial_unet_forward(
                params["unet"], xl, arch["img_resolution"], xl.shape[-1],
                axis_name, model_channels=arch["model_channels"],
                channel_mult=arch["channel_mult"], num_blocks=arch["num_blocks"],
                attn_resolutions=arch["attn_resolutions"])
            mu, ls = spatial_gaussian_forward(params["prior"], xl, num_filters,
                                              axis_name)
            prior = DiagGaussian(mu, ls)
            outs = []
            for k in range(num_samples):
                # same rng on every device -> replicated z per draw
                z = prior.rsample(jax.random.fold_in(rng, k))
                outs.append(spatial_fcomb(params["fcomb"], feats, z))
            return jnp.stack(outs, axis=1).astype(jnp.float32)

        # unchecked: body reaches fused_attention (Pallas) via spatial_unet
        sm = shard_map_unchecked(body, mesh=mesh,
                                 in_specs=(P(), P(None, axis_name), P()),
                                 out_specs=P(None, None, axis_name))
        return sm(params, x, rng)

    return jax.jit(fn)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _replicator(mesh):
    """Jitted identity that reshards its input fully-replicated — the
    host-fetchable layout for multi-process global arrays (built once per
    mesh so repeated calls don't recompile)."""
    return jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))


def _spatial_ensemble_physical(cfg, sample_fn, params, ds, idx, stats_np,
                               mesh, axis, rng, multiprocess: bool = False):
    """Shared plot/CRPS tail: pair synthesis -> H-sharded ensemble decode ->
    gather -> residual->HR inverse on host. Returns (pair, hr_preds) with
    hr_preds (B, K, H, W, C) in physical units.

    ``multiprocess=True`` (plan mode): the split is replicated per process,
    so the pair is computed locally, uploaded as a GLOBAL array via
    make_array_from_process_local_data, decoded by the collective-bearing
    sampler on ALL processes, and the (identical) output gathered replicated
    before the host fetch."""
    import numpy as np

    from probunet_tpu.data import transforms

    hr = jnp.asarray(ds.hr_np[idx])
    sl = None
    if stats_np is not None:
        sl = transforms.slice_stats(tuple(jnp.asarray(s) for s in stats_np),
                                    cfg.standardization, jnp.asarray(idx))
    pair = transforms.make_pair(hr, cfg.lowres_scale, cfg.standardization, sl)
    if multiprocess:
        from probunet_tpu.parallel.multihost import make_global_batch
        x = make_global_batch(np.asarray(pair["inputs"]),
                              NamedSharding(mesh, P(None, axis)))
        preds = jnp.asarray(np.asarray(_replicator(mesh)(sample_fn(params, x, rng))))
    else:
        x = put_spatial(pair["inputs"], mesh, axis)
        preds = jnp.asarray(np.asarray(sample_fn(params, x, rng)))  # gather H
    if sl is not None and cfg.standardization != "perpixel":
        sl_k = (sl[0][:, None], sl[1][:, None])
    else:
        sl_k = sl
    hr_preds = transforms.residual_to_hr(preds, pair["lrinterp"][:, None],
                                         cfg.standardization, sl_k)
    return pair, hr_preds


def _plot_spatial_samples(cfg, sample_fn, params, ds_test, stats_test_np,
                          mesh, axis, epoch, write: bool = True,
                          multiprocess: bool = False):
    """Sampling plots every 2 epochs — the reference main.py:125-134 contract,
    matched with the DP loop's _plot_probunet_samples. Multi-process: the
    collective-bearing decode runs everywhere; only the primary (``write``)
    renders the figure."""
    import os

    import matplotlib.pyplot as plt
    import numpy as np

    from probunet_tpu.viz import plot_sample_batch

    n = min(2, len(ds_test))
    idx = np.random.default_rng(epoch).integers(0, len(ds_test), size=n)
    pair, hr_preds = _spatial_ensemble_physical(
        cfg, sample_fn, params, ds_test, idx, stats_test_np, mesh, axis,
        jax.random.key(epoch), multiprocess=multiprocess)
    if not write:
        return
    fig, _ = plot_sample_batch(np.asarray(pair["lrinterp"]), np.asarray(hr_preds),
                               np.asarray(pair["hr"]),
                               ds_test.timestamps_np[idx], epoch, cfg.variables,
                               lat=ds_test.lat, lon=ds_test.lon,
                               N=n, num_samples=cfg.num_samples)
    fig.savefig(os.path.join(cfg.plotdir, f"epoch{epoch}.png"), dpi=150)
    plt.close(fig)


def _spatial_crps_metrics(cfg, sample_fn, params, ds_val, stats_val_np, mesh,
                          axis, eval_rng, max_batches=None,
                          multiprocess: bool = False):
    """Ensemble CRPS + ensemble-mean MAE in physical units on the val split —
    the SAME metric tail as the DP loop (train.steps._ensemble_crps_metrics),
    decoded through the H-sharded ensemble. ``max_batches=None`` covers the
    FULL split; the evaluated count is logged either way."""
    import numpy as np

    from probunet_tpu.train.steps import _ensemble_crps_metrics

    acc = {}
    vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
    nb = vbatches.shape[0] if max_batches is None else min(vbatches.shape[0],
                                                           int(max_batches))
    for bi in range(nb):
        idx = vbatches[bi]
        pair, hr_preds = _spatial_ensemble_physical(
            cfg, sample_fn, params, ds_val, idx, stats_val_np, mesh, axis,
            jax.random.fold_in(eval_rng, 10_000 + bi), multiprocess=multiprocess)
        for k, v in _ensemble_crps_metrics(hr_preds, pair["hr"],
                                           cfg.variables).items():
            acc.setdefault(k, []).append(float(v))
    out = {k: float(np.mean(v)) for k, v in acc.items()}
    out["crps_batches_evaluated"] = nb
    return out


def train_probunet_spatial(cfg, datasets=None, make_plots: bool = True):
    """Experiment driver for tiles beyond one chip's HBM: the height axis is
    sharded across ALL devices (model parallelism), batches stream from host,
    and every train/eval step is the shard_map'd ELBO. The counterpart of
    ``train.loop.train_probunet`` for ``--parallel_mode spatial``, with the
    same feature surface: sampling plots every 2 epochs over the test split
    (reference main.py:125-134) and optional ensemble CRPS eval, both decoded
    through the H-sharded ensemble tail (:func:`make_spatial_sample_fn`).

    ``--parallel_mode 2d`` composes DATA parallelism on top: a
    (data, space) mesh (``--mesh_shape dp,-1``), batch sharded over ``data``,
    H over ``space`` — the pod-scale layout where spatial groups of sp chips
    each hold a batch shard and gradients all-reduce over the whole mesh.
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

    from probunet_tpu.parallel.multihost import make_plan, require_single_process

    axis = "space"
    two_d = cfg.parallel_mode == "2d"
    if not two_d:
        # pure H-sharding has no batch axis to shard across processes
        require_single_process("the spatial driver (parallel_mode=spatial)", cfg)
    if two_d:
        import jax as _jax
        shape = tuple(cfg.mesh_shape) if len(cfg.mesh_shape) == 2 else (2, -1)
        nd = len(_jax.devices())
        fixed = [s for s in shape if s != -1]
        if nd < 2 or (fixed and nd % int(np.prod(fixed))):
            raise ValueError(
                f"parallel_mode=2d needs a 2D-factorable device count; have "
                f"{nd} devices for mesh_shape {shape} — pass --mesh_shape dp,-1 "
                f"with dp dividing the device count")
        mesh = make_mesh(shape, ("data", axis))
        batch_axis = "data"
        dp = mesh.shape["data"]
        if cfg.batch_size % dp:
            raise ValueError(f"batch_size {cfg.batch_size} must divide the "
                             f"data mesh axis ({dp}) in 2d mode")
    else:
        mesh = make_mesh((-1,), (axis,))
        batch_axis = None
    datasets = datasets or load_datasets(cfg)
    ds_train, ds_val, ds_test = datasets["train"], datasets["val"], datasets["test"]
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # 2d mode composes with the multi-host machinery: batch rows shard over
    # the "data" axis (which spans the processes), H over "space" — the
    # MultihostPlan assembles each step's global batch from per-process rows
    # exactly as in the DP loops. None single-process (unless --data_shards).
    plan = make_plan(cfg, ds_train, mesh) if two_d else None
    if plan is not None and plan.pc > 1 and mesh.shape["data"] % plan.pc:
        raise ValueError(
            f"2d multi-process needs the data axis ({mesh.shape['data']}) to be "
            f"a multiple of process_count ({plan.pc}) so each process owns "
            "contiguous batch shards")

    model = build_probunet(cfg)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer,
                        state_dtype=cfg.opt_state_dtype)
    state = init_probunet_state(cfg, model, tx)
    resume_step = 0
    if cfg.resume:
        from probunet_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(cfg.resume, state)
        resume_step = int(state.step)
        print(f"resumed from {cfg.resume} at step {resume_step}")
    state = (plan.put_state(state) if plan is not None
             else jax.device_put(state, NamedSharding(mesh, P())))

    beta_fn = beta_schedule(cfg.beta_schedule, cfg.beta, cfg.beta_warmup_steps)
    step = make_spatial_probunet_train_step(model, tx, mesh, axis, beta_fn,
                                            dtype, donate=cfg.donate_state,
                                            remat=cfg.remat, accum=cfg.accum,
                                            batch_axis_name=batch_axis)
    eval_fn = make_spatial_eval_elbo(model, mesh, axis, dtype,
                                     batch_axis_name=batch_axis)
    sample_fn = make_spatial_sample_fn(model, mesh, axis, cfg.num_samples, dtype)
    crps_sample_fn = None
    if cfg.eval_crps:
        # built once (a fresh jit per epoch would recompile — loop.py:146 rule)
        crps_sample_fn = make_spatial_sample_fn(model, mesh, axis,
                                                cfg.crps_samples, dtype)

    # Host-resident data (the whole point of this mode); global stats streamed.
    # Plan mode: the TRAIN stats are all-reduced across the year-sharded
    # processes (plan.stats_np); val/test splits are replicated per process.
    if plan is not None:
        stats_np = plan.stats_np
        stats_val_np = plan.split_stats(ds_val)
        stats_test_np = plan.split_stats(ds_test)
    else:
        stats_np = compute_lr_stats_streaming(ds_train.hr_np, cfg.lowres_scale,
                                              cfg.standardization)
        stats_val_np = compute_lr_stats_streaming(ds_val.hr_np, cfg.lowres_scale,
                                                  cfg.standardization)
        stats_test_np = compute_lr_stats_streaming(ds_test.hr_np, cfg.lowres_scale,
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
        return (put_spatial(pair["inputs"], mesh, axis, batch_axis),
                put_spatial(pair["targets"], mesh, axis, batch_axis))

    # Plan mode: pair synthesis runs ON the plan's global batch arrays
    # (hr batch-sharded over "data", H replicated) and the jit reshards the
    # outputs onto the (data, space) layout the shard_map'd ELBO expects.
    xy_sh = NamedSharding(mesh, P(batch_axis, axis))

    def _pair_from_item(hr, stats, idx):
        hr = jnp.take(hr, idx, axis=0)
        sl = transforms.slice_stats(stats, cfg.standardization, idx)
        pair = transforms.make_pair(hr, cfg.lowres_scale, cfg.standardization, sl)
        return pair["inputs"], pair["targets"]

    pair_item_fn = jax.jit(_pair_from_item, out_shardings=(xy_sh, xy_sh))

    def plan_xy(item):
        return pair_item_fn(item["hr"], item["stats"], item["idx"])

    primary = plan is None or plan.is_primary
    os.makedirs(cfg.plotdir, exist_ok=True)
    metrics_path = cfg.metrics_path or os.path.join(cfg.plotdir, "metrics.jsonl")
    logger = MetricLogger(metrics_path if primary else None,
                          use_wandb=cfg.wandb and primary)
    timer = StepTimer(cfg.profile_dir)
    rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
    eval_rng = jax.random.key(cfg.eval_seed, impl=cfg.rng_impl)

    # Exact resume, same mechanism as the DP loop: steps/epoch is constant, so
    # the restored step counter determines (epoch, intra-epoch offset); the
    # step's noise folds on state.step, so the continuation replays the exact
    # sequence an uninterrupted run would have taken.
    nb_epoch = (plan.steps_per_epoch if plan is not None
                else len(ds_train) // cfg.batch_size)
    tr_losses, val_losses = [], []
    step_count = resume_step
    for epoch in range(1, cfg.num_epochs + 1):
        if step_count >= epoch * nb_epoch:
            continue  # epoch fully covered by the resumed checkpoint
        offset = step_count - (epoch - 1) * nb_epoch
        running = []
        timer.reset()
        desc = f"Train(spatial) :: Epoch: {epoch}/{cfg.num_epochs}"

        def after_step(metrics):
            nonlocal step_count
            step_count += 1
            timer.tick(cfg.batch_size)
            running.append(metrics["train_loss"])
            if step_count % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["samples_per_sec"] = timer.rate()
                logger.log(m, step=step_count)

        if plan is not None:
            batches = plan.epoch_batches(cfg.seed + epoch)[offset:]
            it = plan.batch_iter(ds_train.hr_np, batches, stats_np)
            for item in progress(it, desc=desc, total=batches.shape[0]):
                x, y = plan_xy(item)
                state, metrics = step(state, x, y, rng)
                after_step(metrics)
        else:
            batches = ds_train.epoch_indices(cfg.seed + epoch, cfg.batch_size)
            for bi in progress(range(offset, batches.shape[0]), desc=desc):
                x, y = batch_xy(ds_train, batches[bi], stats_np)
                state, metrics = step(state, x, y, rng)
                after_step(metrics)
        tr_losses.append(float(jnp.mean(jnp.stack(running))) if running
                         else float("nan"))

        vloss = []
        if plan is not None:
            vbatches = plan.replicated_batches(len(ds_val))
            for bi in range(vbatches.shape[0]):
                item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                         replicated_source=True)
                x, y = plan_xy(item)
                m = eval_fn(state.params, x, y, jax.random.fold_in(eval_rng, bi),
                            jnp.float32(cfg.beta))
                vloss.append(m["val_loss"])
        else:
            vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
            for bi in range(vbatches.shape[0]):
                x, y = batch_xy(ds_val, vbatches[bi], stats_val_np)
                m = eval_fn(state.params, x, y, jax.random.fold_in(eval_rng, bi),
                            jnp.float32(cfg.beta))
                vloss.append(m["val_loss"])
        val_losses.append(float(jnp.mean(jnp.stack(vloss))))
        logger.log({"epoch": epoch, "epoch_train_loss": tr_losses[-1],
                    "val_loss": val_losses[-1]}, step=step_count)

        # ---- optional ensemble CRPS on the val split (DP-loop contract);
        # the sharded sampler contains mesh collectives, so in plan mode it
        # runs on ALL processes (identical values) and only the primary logs ----
        if crps_sample_fn is not None:
            crps_metrics = _spatial_crps_metrics(
                cfg, crps_sample_fn, state.params, ds_val, stats_val_np,
                mesh, axis, eval_rng,
                max_batches=cfg.crps_eval_batches or None,
                multiprocess=plan is not None and plan.pc > 1)
            logger.log(crps_metrics, step=step_count)

        # ---- sampling plots every 2 epochs over the test split
        # (reference main.py:125-134, same cadence as the DP loop) ----
        if make_plots and epoch % 2 == 0:
            _plot_spatial_samples(cfg, sample_fn, state.params, ds_test,
                                  stats_test_np, mesh, axis, epoch,
                                  write=primary,
                                  multiprocess=plan is not None and plan.pc > 1)

        # all processes: orbax coordinates multi-process saves itself
        save_checkpoint(os.path.join(cfg.checkpoints_dir, "probunet"),
                        jax.device_get(state))
    logger.close()
    return {"state": state, "tr_losses": tr_losses, "val_losses": val_losses,
            "samples_per_sec": timer.rate()}


def make_spatial_eval_elbo(model, mesh, axis_name: str = "space",
                           compute_dtype=jnp.float32,
                           batch_axis_name: Optional[str] = None):
    """Deterministic-given-rng sharded ELBO (dropout off) for eval/validation
    at tile sizes beyond one chip. ``batch_axis_name``: 2D data x spatial."""
    arch = dict(
        img_resolution=tuple(model.img_resolution),
        num_filters=tuple(model.num_filters),
        model_channels=model.model_channels,
        channel_mult=tuple(model.channel_mult),
        num_blocks=model.num_blocks,
        attn_resolutions=tuple(model.attn_resolutions),
    )
    xy_spec = P(batch_axis_name, axis_name)

    def fn(params, x, y, rng, beta):
        def body(params, xl, yl, rng, beta):
            return spatial_probunet_elbo(
                params, xl.astype(compute_dtype), yl.astype(compute_dtype),
                axis_name=axis_name, beta=beta, rng=rng,
                batch_axis_name=batch_axis_name, **arch)

        # unchecked: body reaches fused_attention (Pallas) via spatial_unet
        sm = shard_map_unchecked(
            body, mesh=mesh,
            in_specs=(P(), xy_spec, xy_spec, P(), P()),
            out_specs=(P(), P(), P()))
        total, recon, kl = sm(params, x, y, rng, beta)
        return {"val_loss": total, "val_recon_loss": recon, "val_kl_div": kl}

    return jax.jit(fn)

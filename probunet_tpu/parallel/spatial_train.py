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
    watch: bool = False,
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
        if watch:
            from probunet_tpu.train.steps import _grad_leaf_norms
            metrics.update(_grad_leaf_norms(grads))
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
    sharded across ALL devices (model parallelism) and every train/eval step
    is the shard_map'd ELBO. The counterpart of
    ``train.loop.train_probunet`` for ``--parallel_mode spatial``, with the
    same feature surface — the whole epoch lifecycle (ingest modes, exact
    resume, --checkpoint_every/--max_steps/--watch_every, scheduled-β eval,
    CRPS, plot cadence) comes from the shared engine
    (:mod:`probunet_tpu.train.engine`), so this driver only contributes the
    sharded step functions and the H-sharded ensemble tails.

    Ingest: the default ("auto") STREAMS double-buffered host->device
    batches — the tiles-beyond-HBM mode this driver exists for;
    ``--device_resident_data true`` keeps the dataset tensor device-resident
    (time-sharded across the mesh when divisible) for small tiles. Either
    way LR/HR pair synthesis runs in a jitted reshard
    (``pair_item_fn``) whose outputs land on the (batch, space) layout the
    shard_map'd ELBO expects.

    ``--parallel_mode 2d`` composes DATA parallelism on top: a
    (data, space) mesh (``--mesh_shape dp,-1``), batch sharded over ``data``,
    H over ``space`` — the pod-scale layout where spatial groups of sp chips
    each hold a batch shard and gradients all-reduce over the whole mesh.
    """
    import numpy as np

    from probunet_tpu.data import transforms
    from probunet_tpu.parallel import make_mesh
    from probunet_tpu.parallel.multihost import make_plan, process_info
    from probunet_tpu.train.engine import EngineFns, EngineSpec, run_training
    from probunet_tpu.train.loop import build_probunet, init_probunet_state
    from probunet_tpu.train.steps import beta_schedule

    axis = "space"
    two_d = cfg.parallel_mode == "2d"
    _, pc = process_info()
    if not two_d:
        # pure H-sharding has no batch axis to shard across processes; the
        # multi-process layout for spatial sharding IS the 2d mesh
        if pc > 1:
            raise NotImplementedError(
                "pure --parallel_mode spatial is single-process (there is no "
                "batch axis to shard across processes); for multi-process "
                f"spatial sharding run --parallel_mode 2d --mesh_shape {pc},-1 "
                "— one batch shard per process on the 'data' axis, H sharded "
                "over the remaining devices")
        if int(getattr(cfg, "data_shards", 0)) > 1:
            raise ValueError(
                "--data_shards applies to the multi-host batch plan, which "
                "pure spatial mode has none of — use --parallel_mode 2d "
                "--mesh_shape <shards>,-1")
    if two_d:
        shape = tuple(cfg.mesh_shape) if len(cfg.mesh_shape) == 2 else (2, -1)
        nd = len(jax.devices())
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

    def build_plan(cfg, ds_train, mesh):
        # 2d mode composes with the multi-host machinery: batch rows shard
        # over the "data" axis (which spans the processes), H over "space" —
        # the MultihostPlan assembles each step's global batch from
        # per-process rows exactly as in the DP loops.
        plan = make_plan(cfg, ds_train, mesh) if two_d else None
        if plan is not None and plan.pc > 1 and mesh.shape["data"] % plan.pc:
            raise ValueError(
                f"2d multi-process needs the data axis ({mesh.shape['data']}) "
                f"to be a multiple of process_count ({plan.pc}) so each "
                "process owns contiguous batch shards")
        return plan

    model = build_probunet(cfg)
    beta_fn = beta_schedule(cfg.beta_schedule, cfg.beta, cfg.beta_warmup_steps)
    accum = max(1, int(cfg.accum))
    xy_sh = NamedSharding(mesh, P(batch_axis, axis))

    def make_fns(ctx):
        dtype = ctx.dtype
        step = make_spatial_probunet_train_step(
            model, ctx.tx, mesh, axis, beta_fn, dtype, donate=cfg.donate_state,
            remat=cfg.remat, accum=cfg.accum, batch_axis_name=batch_axis,
            watch=cfg.watch_every > 0)
        eval_fn = make_spatial_eval_elbo(model, mesh, axis, dtype,
                                         batch_axis_name=batch_axis)
        sample_fn = make_spatial_sample_fn(model, mesh, axis, cfg.num_samples,
                                           dtype)
        crps_sample_fn = None
        if cfg.eval_crps:
            # built once (a fresh jit per epoch would recompile)
            crps_sample_fn = make_spatial_sample_fn(model, mesh, axis,
                                                    cfg.crps_samples, dtype)

        # Pair synthesis as a jitted reshard: gather the batch rows (identity
        # when the item already IS the batch), make the LR/HR pair, land the
        # outputs on the (batch, space) layout the shard_map'd ELBO expects.
        def _pair_from_item(hr, stats, idx):
            hr = jnp.take(hr, idx, axis=0)
            sl = transforms.slice_stats(stats, cfg.standardization, idx)
            pair = transforms.make_pair(hr, cfg.lowres_scale,
                                        cfg.standardization, sl)
            return pair["inputs"], pair["targets"]

        pair_item_fn = jax.jit(_pair_from_item, out_shardings=(xy_sh, xy_sh))

        def train_call(state, item, rng):
            x, y = pair_item_fn(item["hr"], item["stats"], item["idx"])
            return step(state, x, y, rng)

        def eval_call(params, item, rng, beta):
            x, y = pair_item_fn(item["hr"], item["stats"], item["idx"])
            return eval_fn(params, x, y, rng, beta)

        # Host-numpy split stats for the CRPS/plot tails (they synthesize
        # pairs from host data regardless of the training ingest mode).
        def host_split_stats(ds):
            if cfg.standardization == "none":
                return None
            if ctx.plan is not None:
                return ctx.plan.split_stats(ds)
            if ctx.streaming:
                from probunet_tpu.data.pipeline import compute_lr_stats_streaming
                return compute_lr_stats_streaming(ds.hr_np, cfg.lowres_scale,
                                                  cfg.standardization)
            return tuple(np.asarray(s) for s in ds.stats)

        multiprocess = ctx.plan is not None and ctx.plan.pc > 1
        ds_val, ds_test = ctx.datasets["val"], ctx.datasets["test"]
        stats_val_np = host_split_stats(ds_val)
        stats_test_np = host_split_stats(ds_test)

        def crps_epoch_fn(state, eval_rng):
            # the sharded sampler contains mesh collectives, so in plan mode
            # it runs on ALL processes (identical values); primary logs
            return _spatial_crps_metrics(
                cfg, crps_sample_fn, state.params, ds_val, stats_val_np,
                mesh, axis, eval_rng,
                max_batches=cfg.crps_eval_batches or None,
                multiprocess=multiprocess)

        def plot_fn(state, epoch):
            _plot_spatial_samples(cfg, sample_fn, state.params, ds_test,
                                  stats_test_np, mesh, axis, epoch,
                                  write=ctx.primary, multiprocess=multiprocess)

        return EngineFns(
            train_call=train_call, eval_call=eval_call,
            eval_beta_fn=lambda gs: beta_fn(jnp.asarray(gs, jnp.int32) // accum),
            crps_epoch_fn=crps_epoch_fn if crps_sample_fn is not None else None,
            plot_fn=plot_fn)

    spec = EngineSpec(
        name="probunet", metrics_filename="metrics.jsonl",
        init_state=lambda tx: init_probunet_state(cfg, model, tx),
        make_fns=make_fns, desc="Train(spatial)", rng_offset=1,
        build_mesh=lambda cfg: mesh, build_plan=build_plan,
        loss_curve="loss.png")
    return run_training(cfg, spec, datasets, make_plots)


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

"""Experiment drivers (reference main.py / baseline/main.py), as thin
configurations of the shared training engine.

``train_probunet``: datasets -> ProbabilisticUNet -> epoch loop of fused
train steps -> seeded stochastic eval -> ensemble sampling plots every 2
epochs -> loss curves + checkpoints (reference main.py:101-145).
``train_edm``: the same surface for the diffusion downscaler (the
reference's dead EDMPrecond made live). ``train_baseline``: the
deterministic U-Net / LinearCNN / BCSD driver with per-variable losses and
final physical-unit MAE (baseline/main.py:112-115).

The epoch loop itself — ingest-mode selection, logging/watch/checkpoint
cadences, max_steps, exact resume, eval/CRPS/plot scheduling — lives ONCE in
:mod:`probunet_tpu.train.engine`; each driver here contributes only its model
builder, fused step functions and plotting/final tails, so every lifecycle
flag works identically across all drivers (tests/test_engine_matrix.py).

All device work is data-parallel over the configured mesh; the loops only
move O(batch) index vectors per step — the dataset tensor lives in HBM.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.data.dataset import ClimexDataset
from probunet_tpu.models import LinearCNN, ProbabilisticUNet, UNet
from probunet_tpu.parallel import put_replicated
from probunet_tpu.train import (
    beta_schedule,
    create_train_state,
    make_deterministic_eval_step,
    make_deterministic_train_step,
    make_probunet_eval_step,
    make_probunet_train_step,
    make_sample_fn,
)
from probunet_tpu.train.engine import (
    EngineFns,
    EngineSpec,
    load_datasets,  # noqa: F401  (public API, used by tests/scripts)
    run_training,
)


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def build_probunet(cfg: Config):
    """The probabilistic model for this config: the Probabilistic U-Net, or —
    for ``ds_model=vae`` — the conditional conv-VAE baseline (same
    elbo/sample surface, so every downstream consumer is shared)."""
    if cfg.ds_model == "vae":
        from probunet_tpu.models.baselines import ConvVAE
        return ConvVAE(input_channels=cfg.nvars, num_classes=cfg.nvars,
                       latent_dim=cfg.latent_dim,
                       num_filters=tuple(cfg.num_filters),
                       beta=cfg.beta, decoder_channels=cfg.baseline_channels)
    return ProbabilisticUNet(
        input_channels=cfg.nvars,
        num_classes=cfg.nvars,
        latent_dim=cfg.latent_dim,
        num_filters=tuple(cfg.num_filters),
        beta=cfg.beta,
        img_resolution=tuple(cfg.resolution),
        model_channels=cfg.model_channels,
        channel_mult=tuple(cfg.channel_mult),
        num_blocks=cfg.num_blocks,
        attn_resolutions=tuple(cfg.attn_resolutions),
        dropout=cfg.dropout,
        fast_attention=cfg.fast_attention,
        remat=cfg.remat,
    )


def init_probunet_state(cfg: Config, model, tx, rng=None):
    from probunet_tpu.utils.hostinit import init_on_cpu

    rng = rng if rng is not None else jax.random.key(cfg.seed)
    h, w = cfg.resolution
    variables = init_on_cpu(lambda: model.init(
        {"params": rng, "latent": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, h, w, cfg.nvars)), jnp.zeros((1, h, w, cfg.nvars)),
        method=model.elbo))
    return create_train_state(variables["params"], tx)


def abstract_probunet_state(cfg: Config, model, tx):
    """Shape/dtype-only TrainState via ``jax.eval_shape`` — nothing is
    materialized. Used as the checkpoint-restore template on the serving path,
    where a real init costs ~30 s (NOTES.md #4) just to be overwritten."""
    from probunet_tpu.train.state import TrainState

    h, w = cfg.resolution
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(0),
         "dropout": jax.random.key(0)},
        jnp.zeros((1, h, w, cfg.nvars)), jnp.zeros((1, h, w, cfg.nvars)),
        method=model.elbo))
    params = variables["params"]
    opt_state = jax.eval_shape(tx.init, params)
    return TrainState(params, opt_state, jax.ShapeDtypeStruct((), jnp.int32))


def train_probunet(cfg: Config, datasets: Optional[Dict[str, ClimexDataset]] = None,
                   make_plots: bool = True) -> Dict:
    """The reference ``main.py`` pipeline, TPU-native."""
    if cfg.parallel_mode in ("spatial", "2d"):
        # H-axis model parallelism for tiles beyond one chip's HBM ("2d" adds
        # data parallelism on a (data, space) mesh): the whole ELBO runs
        # inside a shard_map (halo convs, psum GN, sharded dropout).
        if cfg.ds_model == "vae":
            raise ValueError("ds_model=vae has no spatially-sharded kernels; "
                             "use parallel_mode=data")
        from probunet_tpu.parallel.spatial_train import train_probunet_spatial
        return train_probunet_spatial(cfg, datasets, make_plots=make_plots)

    model = build_probunet(cfg)
    dtype = _compute_dtype(cfg)
    beta_fn = beta_schedule(cfg.beta_schedule, cfg.beta, cfg.beta_warmup_steps)
    accum = max(1, int(cfg.accum))

    def make_fns(ctx):
        train_step = make_probunet_train_step(
            model, ctx.tx, cfg.lowres_scale, cfg.standardization, beta_fn, dtype,
            donate=cfg.donate_state, accum=cfg.accum, watch=cfg.watch_every > 0)
        eval_step = make_probunet_eval_step(model, cfg.lowres_scale,
                                            cfg.standardization, dtype)
        sample_fn = make_sample_fn(model, cfg.lowres_scale, cfg.standardization,
                                   cfg.num_samples, dtype)
        crps_fn = None
        if cfg.eval_crps:
            # Built ONCE here: constructing it inside the epoch loop would
            # create a fresh jax.jit instance (a full recompile) every epoch.
            from probunet_tpu.train import make_crps_eval_fn
            crps_fn = make_crps_eval_fn(model, cfg.lowres_scale,
                                        cfg.standardization, cfg.variables,
                                        cfg.crps_samples, dtype)

        def train_call(state, item, rng):
            return train_step(state, item["hr"], item["stats"], item["idx"], rng)

        def eval_call(params, item, rng, beta):
            return eval_step(params, item["hr"], item["stats"], item["idx"],
                             rng, beta)

        def crps_call(params, item, rng):
            return crps_fn(params, item["hr"], item["stats"], item["idx"], rng)

        def plot_fn(state, epoch):
            _plot_probunet_samples(cfg, model, state, ctx.datasets["test"],
                                   sample_fn, ctx.mesh, epoch, plan=ctx.plan)

        return EngineFns(
            train_call=train_call,
            eval_call=eval_call,
            # eval at the SCHEDULED β so annealed runs (--beta_schedule
            # linear/cyclic) log train/val ELBOs computed at the same KL weight
            eval_beta_fn=lambda gs: beta_fn(jnp.asarray(gs, jnp.int32) // accum),
            crps_call=crps_call if crps_fn is not None else None,
            plot_fn=plot_fn,
        )

    ckpt_name = "probunet" if cfg.ds_model == "probabilistic_unet" else cfg.ds_model
    spec = EngineSpec(
        name=ckpt_name, metrics_filename="metrics.jsonl",
        init_state=lambda tx: init_probunet_state(cfg, model, tx),
        make_fns=make_fns, desc="Train", rng_offset=1,
        wandb_config=True, loss_curve="loss.png")
    return run_training(cfg, spec, datasets, make_plots)


def _plot_probunet_samples(cfg, model, state, ds_test, sample_fn, mesh, epoch,
                           plan=None):
    from probunet_tpu.viz import plot_sample_batch
    n = min(2, len(ds_test))
    idx = np.random.default_rng(epoch).integers(0, len(ds_test), size=n)
    if plan is not None:
        # test split is replicated per process; arrays go up as global
        # replicated device arrays, the jit runs on ALL processes (it contains
        # mesh collectives), only the primary writes the figure
        from probunet_tpu.parallel.multihost import make_global_batch
        hr_test = make_global_batch(ds_test.hr_np, plan.replicated)
        stats_np = plan.split_stats(ds_test)
        stats_test = None if stats_np is None else tuple(
            make_global_batch(np.asarray(s, np.float32), plan.replicated)
            for s in stats_np)
    else:
        hr_test = put_replicated(ds_test.hr_device(), mesh)
        stats_test = put_replicated(ds_test.stats, mesh)
    hr_preds, pair = sample_fn(state.params, hr_test, stats_test, np.asarray(idx),
                               jax.random.key(epoch))
    if plan is not None and not plan.is_primary:
        return
    fig, _ = plot_sample_batch(np.asarray(pair["lrinterp"]), np.asarray(hr_preds),
                               np.asarray(pair["hr"]),
                               ds_test.timestamps_np[idx], epoch, cfg.variables,
                               lat=ds_test.lat, lon=ds_test.lon,
                               N=n, num_samples=cfg.num_samples)
    fig.savefig(os.path.join(cfg.plotdir, f"epoch{epoch}.png"), dpi=150)
    import matplotlib.pyplot as plt
    plt.close(fig)


def _label_dim(cfg: Config) -> int:
    """Feature width of transforms.time_features for this config. 'id' keeps
    the reference behaviour — label_dim=0, so the raw-timestamp class_labels
    are ignored (trainmodel.py:157 with label_dim=0); 'cyclic' makes the
    timetransform knob LIVE: the (sin, cos) annual phase drives the U-Net's
    map_label embedding."""
    return 2 if cfg.timetransform == "cyclic" else 0


def build_edm_model(cfg: Config):
    """EDM-preconditioned diffusion downscaler (the reference ships
    EDMPrecond dead, networks.py:339-389; ds_model="edm" trains it). The
    denoiser UNet sees the noisy residual channel-concatenated with the
    LR-interp conditioning image. ``fast_attention``/``remat`` thread through
    to the backbone exactly as in the prob-U-Net (remat is what makes
    256x256 EDM training fit in HBM)."""
    from probunet_tpu.models import EDMPrecond

    return EDMPrecond(
        img_resolution=tuple(cfg.resolution),
        in_channels=2 * cfg.nvars,
        out_channels=cfg.nvars,
        model_channels=cfg.model_channels,
        channel_mult=tuple(cfg.channel_mult),
        num_blocks=cfg.num_blocks,
        attn_resolutions=tuple(cfg.attn_resolutions),
        dropout=cfg.dropout,
        fast_attention=cfg.fast_attention,
        remat=cfg.remat)


def init_edm_state(cfg: Config, model, tx):
    from probunet_tpu.utils.hostinit import init_on_cpu

    h, w = cfg.resolution
    variables = init_on_cpu(lambda: model.init(
        {"params": jax.random.key(cfg.seed), "dropout": jax.random.key(cfg.seed + 1)},
        jnp.zeros((1, h, w, cfg.nvars)), jnp.ones((1,)),
        condition_img=jnp.zeros((1, h, w, cfg.nvars))))
    return create_train_state(variables["params"], tx)


def abstract_edm_state(cfg: Config, model, tx):
    """eval_shape-only restore template (no real init on the serving path,
    mirroring abstract_probunet_state)."""
    from probunet_tpu.train.state import TrainState

    h, w = cfg.resolution
    variables = jax.eval_shape(lambda: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(0)},
        jnp.zeros((1, h, w, cfg.nvars)), jnp.ones((1,)),
        condition_img=jnp.zeros((1, h, w, cfg.nvars))))
    params = variables["params"]
    opt_state = jax.eval_shape(tx.init, params)
    return TrainState(params, opt_state, jax.ShapeDtypeStruct((), jnp.int32))


def train_edm(cfg: Config, datasets: Optional[Dict[str, ClimexDataset]] = None,
              make_plots: bool = True) -> Dict:
    """Diffusion-based downscaling driver (ds_model="edm"): denoising-score-
    matching training (train.steps.make_edm_train_step), seeded DSM eval,
    Heun-sampled ensembles for the every-2-epochs plots (same contract as the
    prob-U-Net loop), checkpoints. Completes the 'make the dead code live'
    story for the reference's unused EDMPrecond."""
    from probunet_tpu.train import (make_edm_crps_eval_fn, make_edm_eval_step,
                                    make_edm_sample_fn, make_edm_train_step)

    model = build_edm_model(cfg)
    dtype = _compute_dtype(cfg)

    def make_fns(ctx):
        train_step = make_edm_train_step(model, ctx.tx, cfg.lowres_scale,
                                         cfg.standardization, compute_dtype=dtype,
                                         donate=cfg.donate_state,
                                         watch=cfg.watch_every > 0)
        eval_step = make_edm_eval_step(model, cfg.lowres_scale,
                                       cfg.standardization, compute_dtype=dtype)
        sample_fn = make_edm_sample_fn(model, cfg.lowres_scale, cfg.standardization,
                                       cfg.num_samples, cfg.edm_steps,
                                       compute_dtype=dtype)
        crps_fn = None
        if cfg.eval_crps:
            # built once (fresh jit per epoch = recompile)
            crps_fn = make_edm_crps_eval_fn(model, cfg.lowres_scale,
                                            cfg.standardization, cfg.variables,
                                            cfg.crps_samples, cfg.edm_steps,
                                            compute_dtype=dtype)

        def train_call(state, item, rng):
            return train_step(state, item["hr"], item["stats"], item["idx"], rng)

        def eval_call(params, item, rng, beta):
            return eval_step(params, item["hr"], item["stats"], item["idx"], rng)

        def crps_call(params, item, rng):
            return crps_fn(params, item["hr"], item["stats"], item["idx"], rng)

        def plot_fn(state, epoch):
            # make_edm_sample_fn shares make_sample_fn's surface, so the
            # prob-U-Net plot helper serves the diffusion ensemble unchanged
            _plot_probunet_samples(cfg, model, state, ctx.datasets["test"],
                                   sample_fn, ctx.mesh, epoch, plan=ctx.plan)

        return EngineFns(
            train_call=train_call, eval_call=eval_call,
            crps_call=crps_call if crps_fn is not None else None,
            plot_fn=plot_fn)

    spec = EngineSpec(
        name="edm", metrics_filename="metrics_edm.jsonl",
        init_state=lambda tx: init_edm_state(cfg, model, tx),
        make_fns=make_fns, desc="Train(edm)", rng_offset=3,
        loss_curve="loss_edm.png")
    return run_training(cfg, spec, datasets, make_plots)


def build_baseline_model(cfg: Config):
    if cfg.ds_model == "deterministic_unet":
        # reference baseline/deterministic_unet.py:232,274: width 64, no attention.
        # The baseline width has its own flag so --model_channels (prob-U-Net
        # width) never silently changes what this builds.
        width = cfg.baseline_channels
        return UNet(img_resolution=tuple(cfg.resolution), in_channels=cfg.nvars,
                    out_channels=cfg.nvars, label_dim=_label_dim(cfg),
                    use_diffuse=False,
                    model_channels=width, channel_mult=tuple(cfg.channel_mult),
                    num_blocks=cfg.num_blocks, attn_resolutions=(),
                    bottleneck_attention=False, dropout=cfg.dropout,
                    remat=cfg.remat)
    if cfg.ds_model == "linearcnn":
        return LinearCNN(resolution=tuple(cfg.resolution), in_channels=cfg.nvars,
                         ds_factor=cfg.lowres_scale)
    raise ValueError(f"unknown ds_model {cfg.ds_model!r}")


def train_baseline(cfg: Config, datasets: Optional[Dict[str, ClimexDataset]] = None,
                   make_plots: bool = True) -> Dict:
    """The reference ``baseline/main.py`` pipeline (deterministic models + BCSD)."""
    if cfg.ds_model == "bcsd":
        return run_bcsd(cfg, datasets or load_datasets(cfg))
    if cfg.ds_model == "edm":
        return train_edm(cfg, datasets, make_plots)
    if cfg.ds_model == "vae":
        # the conv-VAE shares the probabilistic (ELBO) surface, so it trains
        # through the prob-U-Net loop (reference lists vae under the
        # deterministic driver's choices but never dispatches it)
        return train_probunet(cfg, datasets, make_plots)

    model = build_baseline_model(cfg)
    dtype = _compute_dtype(cfg)

    def init_state(tx):
        h, w = cfg.resolution
        rngs = {"params": jax.random.key(cfg.seed),
                "dropout": jax.random.key(cfg.seed + 1)}
        label_cols = 2 if cfg.timetransform == "cyclic" else 1  # time_features width
        variables = model.init(rngs, jnp.zeros((1, h, w, cfg.nvars)),
                               class_labels=jnp.zeros((1, label_cols)), train=False)
        return create_train_state(variables["params"], tx)

    tr_losses = {v: [] for v in cfg.variables}
    val_losses = {v: [] for v in cfg.variables}

    def make_fns(ctx):
        train_step = make_deterministic_train_step(
            model, ctx.tx, cfg.lowres_scale, cfg.standardization, dtype,
            donate=cfg.donate_state, timetransform=cfg.timetransform,
            watch=cfg.watch_every > 0)
        eval_step = make_deterministic_eval_step(
            model, cfg.lowres_scale, cfg.standardization, cfg.variables,
            reconstruct=False, timetransform=cfg.timetransform)
        mae_step = make_deterministic_eval_step(
            model, cfg.lowres_scale, cfg.standardization, cfg.variables,
            reconstruct=True, loss="mae", timetransform=cfg.timetransform)

        def train_call(state, item, rng):
            return train_step(state, item["hr"], item["stats"], item["idx"],
                              item["timestamps"], rng)

        def eval_call(params, item, rng, beta):
            return eval_step(params, item["hr"], item["stats"], item["idx"],
                             item["timestamps"])

        def on_train_metrics(metrics):
            for i, v in enumerate(cfg.variables):
                tr_losses[v].append(float(metrics[f"train_loss_var{i}"]))

        def on_val_metrics(mf):
            for v in cfg.variables:
                val_losses[v].append(mf[f"eval_{v}"])

        def final_fn(state, logger, global_step):
            # sample + plot_batch (baseline/main.py:88-90, trainmodel.py:204-233)
            if make_plots and ctx.primary:
                ds_val = ctx.ds_val
                if ctx.hr_val is not None:
                    hr_v, st_v, ts_v = ctx.hr_val, ctx.stats_val, ctx.ts_val
                else:
                    # plan/streaming: plot from this process's host copy (no
                    # mesh collectives in the plot path)
                    hr_v = jnp.asarray(ds_val.hr_np)
                    stats_np = (ctx.stats_val_np if ctx.stats_val_np is not None
                                else None)
                    st_v = None if stats_np is None else tuple(
                        jnp.asarray(s) for s in stats_np)
                    ts_v = jnp.asarray(ds_val.timestamps_np)
                plot_state = state
                if ctx.plan is not None:
                    from probunet_tpu.train.state import TrainState
                    plot_state = TrainState(jax.device_get(state.params), None, 0)
                _plot_baseline_samples(cfg, model, plot_state, ds_val, hr_v,
                                       st_v, ts_v)
                _plot_baseline_losses(cfg, tr_losses, val_losses)

            # final physical-unit MAE (reference baseline/main.py:112-115)
            mae = {v: [] for v in cfg.variables}
            for gids in ctx.val_batches():
                item = ctx.val_item(gids)
                m = mae_step(state.params, item["hr"], item["stats"],
                             item["idx"], item["timestamps"])
                for v in cfg.variables:
                    mae[v].append(float(m[f"eval_{v}"]))
            mae = {v: float(np.mean(x)) for v, x in mae.items()}
            if ctx.primary:
                for v in cfg.variables:
                    print(f"MAE for {v} on validation data: ", mae[v])
            logger.log({f"mae_{v}": mae[v] for v in cfg.variables},
                       step=global_step)
            return {"tr_losses": tr_losses, "val_losses": val_losses, "mae": mae}

        return EngineFns(
            train_call=train_call, eval_call=eval_call,
            on_train_metrics=on_train_metrics, on_val_metrics=on_val_metrics,
            final_fn=final_fn)

    spec = EngineSpec(
        name=cfg.ds_model, metrics_filename="metrics_baseline.jsonl",
        init_state=init_state, make_fns=make_fns, desc="Train", rng_offset=2,
        needs_timestamps=True)
    return run_training(cfg, spec, datasets, make_plots)


def run_bcsd(cfg: Config, datasets: Dict[str, ClimexDataset],
             chunk: int = 1024) -> Dict:
    """BCSD baseline on the validation and test splits, chunked.

    The day-of-year climatologies are accumulated over time-chunks (segment
    sums into a fixed (365, H, W, C) buffer) and predictions stream chunk by
    chunk, so device memory is O(chunk + 365 tiles) instead of O(full split) —
    the full ClimEx domain at century scale never materializes in HBM.
    """
    from probunet_tpu.data import transforms

    ds_train = datasets["train"]
    t_all, h, w, c = ds_train.hr_np.shape
    chunk = min(chunk, t_all)

    @jax.jit
    def accum(num, den, cnt, hr, doy):
        lri = transforms.make_pair(hr, cfg.lowres_scale, "none", None)["lrinterp"]
        num = num + jax.ops.segment_sum(hr, doy, num_segments=365)
        den = den + jax.ops.segment_sum(lri, doy, num_segments=365)
        cnt = cnt + jax.ops.segment_sum(jnp.ones_like(doy, hr.dtype), doy,
                                        num_segments=365)
        return num, den, cnt

    num = jnp.zeros((365, h, w, c))
    den = jnp.zeros((365, h, w, c))
    cnt = jnp.zeros((365,))
    doy_train = ds_train.dayofyear
    # pad the tail chunk so one program shape serves the whole pass
    for lo in range(0, t_all, chunk):
        hr_c = ds_train.hr_np[lo:lo + chunk]
        doy_c = doy_train[lo:lo + chunk]
        if hr_c.shape[0] < chunk:
            pad = chunk - hr_c.shape[0]
            hr_c = np.concatenate([hr_c, np.zeros((pad, h, w, c), hr_c.dtype)])
            doy_c = np.concatenate([doy_c, np.full((pad,), 364, doy_c.dtype)])
            num, den, cnt = accum(num, den, cnt, jnp.asarray(hr_c), jnp.asarray(doy_c))
            cnt = cnt.at[364].add(-pad)  # padded rows were zero fields; fix the count
        else:
            num, den, cnt = accum(num, den, cnt, jnp.asarray(hr_c), jnp.asarray(doy_c))
    # Multi-process: the train split is year-sharded per process, so the
    # climatology accumulators are partial sums — merge them (they are exactly
    # mergeable) so every process applies the GLOBAL train climatology.
    from probunet_tpu.parallel.multihost import allreduce_sum, process_info
    _, pc = process_info()
    if pc > 1:
        num_h, den_h, cnt_h = allreduce_sum(np.asarray(num, np.float64),
                                            np.asarray(den, np.float64),
                                            np.asarray(cnt, np.float64))
        num = jnp.asarray(num_h, jnp.float32)
        den = jnp.asarray(den_h, jnp.float32)
        cnt = jnp.asarray(cnt_h, jnp.float32)
    cnt_c = jnp.maximum(cnt, 1.0)[:, None, None, None]
    scale = (num / cnt_c) / (den / cnt_c + 1e-9)

    @jax.jit
    def predict(hr, doy):
        lri = transforms.make_pair(hr, cfg.lowres_scale, "none", None)["lrinterp"]
        preds = lri * scale[doy]
        abs_err = jnp.abs(preds - hr).mean(axis=(0, 1, 2))  # per-variable
        return preds, abs_err

    out = {}
    for split in ("val", "test"):
        ds = datasets[split]
        doy = ds.dayofyear
        pred_chunks, err_sum, n_chunks = [], 0.0, 0
        for lo in range(0, len(ds), chunk):
            hr_c = jnp.asarray(ds.hr_np[lo:lo + chunk])
            preds, abs_err = predict(hr_c, jnp.asarray(doy[lo:lo + chunk]))
            pred_chunks.append(np.asarray(preds))
            err_sum = err_sum + np.asarray(abs_err, np.float64) * hr_c.shape[0]
            n_chunks += hr_c.shape[0]
        preds = np.concatenate(pred_chunks, axis=0)
        mae = {v: float(err_sum[i] / n_chunks) for i, v in enumerate(cfg.variables)}
        out[split] = {"preds": preds, "mae": mae}
        print(f"BCSD {split} MAE:", mae)
    return out


def moving_average(x, w: int):
    """Smoothing for loss-curve plots (reference baseline/main.py:12-13).
    Empty in -> empty out (a --max_steps stop can end a run before any eval
    batch, leaving a loss series empty)."""
    x = np.asarray(x)
    if x.size == 0:
        return x
    w = max(1, min(w, len(x)))
    return np.convolve(x, np.ones(w), "valid") / w


def _plot_baseline_samples(cfg, model, state, ds_val, hr_val, stats_val, ts_val):
    """One batch forward -> residual_to_hr -> plot_batch (trainmodel.py:204-233)."""
    from probunet_tpu.data import transforms
    from probunet_tpu.viz import plot_batch
    import matplotlib.pyplot as plt

    n = min(2, len(ds_val))
    idx = jnp.asarray(np.random.default_rng(0).integers(0, len(ds_val), size=max(n, 2)))
    hr = hr_val[idx]
    sl = transforms.slice_stats(stats_val, cfg.standardization, idx)
    pair = transforms.make_pair(hr, cfg.lowres_scale, cfg.standardization, sl)
    preds = model.apply({"params": state.params}, pair["inputs"],
                        class_labels=transforms.time_features(
                            ts_val[idx], cfg.timetransform), train=False)
    hr_pred = transforms.residual_to_hr(preds.astype(jnp.float32), pair["lrinterp"],
                                        cfg.standardization, sl)
    fig, _ = plot_batch(pair["lrinterp"], hr_pred, pair["hr"],
                        ds_val.timestamps_np[np.asarray(idx)], cfg.num_epochs,
                        cfg.variables, lat=ds_val.lat, lon=ds_val.lon, N=n)
    fig.savefig(os.path.join(cfg.plotdir,
                             f"epoch{cfg.num_epochs}_samples_from_{cfg.ds_model}.png"), dpi=150)
    plt.close(fig)


def _plot_baseline_losses(cfg, tr_losses, val_losses):
    """Per-variable smoothed train/val loss curves (baseline/main.py:93-106)."""
    import matplotlib.pyplot as plt

    for var in cfg.variables:
        tr = moving_average(tr_losses[var], w=24)
        vl = moving_average(val_losses[var], w=48)
        if len(tr) == 0 or len(vl) == 0:
            continue
        tr_x = np.arange(1, len(tr) + 1)
        val_x = np.linspace(1, len(tr) + 1, len(vl))
        fig = plt.figure(figsize=(15, 10))
        plt.plot(tr_x, tr, lw=2, label="training loss")
        plt.plot(val_x, vl, lw=2, linestyle="dashed", label="validation loss")
        plt.xlabel("Steps")
        plt.ylabel("Loss")
        plt.title(f"Loss for {var}")
        plt.legend()
        fig.savefig(os.path.join(cfg.plotdir, f"loss_{var}.png"), dpi=150)
        plt.close(fig)

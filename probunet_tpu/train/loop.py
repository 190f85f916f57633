"""End-to-end experiment drivers (reference main.py / baseline/main.py).

``train_probunet``: build datasets -> ProbabilisticUNet -> epoch loop of
fused train steps -> seeded stochastic eval -> ensemble sampling plots every
2 epochs -> loss curves + checkpoints. ``train_baseline``: the deterministic
U-Net / LinearCNN / BCSD driver with per-variable losses and final
physical-unit MAE (baseline/main.py:112-115).

All device work is data-parallel over the configured mesh; the loops only
move O(batch) index vectors per step — the dataset tensor lives in HBM.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.data.dataset import ClimexDataset
from probunet_tpu.models import LinearCNN, ProbabilisticUNet, UNet
from probunet_tpu.parallel import make_mesh, put_batch, put_replicated
from probunet_tpu.train import (
    beta_schedule,
    create_train_state,
    make_deterministic_eval_step,
    make_deterministic_train_step,
    make_probunet_eval_step,
    make_probunet_train_step,
    make_sample_fn,
)
from probunet_tpu.train.checkpoint import save_checkpoint
from probunet_tpu.train.state import make_optimizer
from probunet_tpu.utils.logging import MetricLogger, StepTimer, progress


def _compute_dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _crps_batches(cfg: Config, n_val_batches: int) -> int:
    """How many val batches the per-epoch CRPS eval covers: the FULL split by
    default; ``--crps_eval_batches N`` bounds the cost for huge splits. The
    count is always logged (crps_batches_evaluated) so a truncated metric can
    never masquerade as the split metric."""
    if cfg.crps_eval_batches:
        return min(n_val_batches, int(cfg.crps_eval_batches))
    return n_val_batches


def load_datasets(cfg: Config) -> Dict[str, ClimexDataset]:
    """Build the three split datasets. Multi-host: each process ingests only
    its contiguous shard of the TRAIN years (per-host file sharding, the dask
    role in reference main.py:12); val/test stay replicated so every process
    evaluates the same data."""
    from probunet_tpu.parallel.multihost import process_info, shard_years

    pi, pc = process_info()
    out = {}
    for split in ("train", "val", "test"):
        years = cfg.years(split)
        if split == "train" and pc > 1:
            years = shard_years(years, pi, pc)
        out[split] = ClimexDataset(
            cfg.datadir, years=years, variables=cfg.variables,
            coords=cfg.coords, lowres_scale=cfg.lowres_scale,
            time_transform=cfg.timetransform, standardization=cfg.standardization)
    return out


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
    from probunet_tpu.parallel.multihost import make_plan

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    datasets = datasets or load_datasets(cfg)
    ds_train, ds_val, ds_test = datasets["train"], datasets["val"], datasets["test"]
    # Lockstep multi-process plan (global stats + stratified global batches);
    # None on a plain single-host run.
    plan = make_plan(cfg, ds_train, mesh)

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
    state = plan.put_state(state) if plan else put_replicated(state, mesh)
    if cfg.max_steps and resume_step >= cfg.max_steps:
        # finished step-bounded run: resuming must be a pure no-op (no extra
        # step, no new checkpoint) — same semantics as the epoch-bounded case
        print(f"max_steps={cfg.max_steps} already reached at resume "
              f"(step {resume_step}); nothing to do")
        return {"state": state, "tr_losses": [], "val_losses": [],
                "samples_per_sec": 0.0}

    dtype = _compute_dtype(cfg)
    beta_fn = beta_schedule(cfg.beta_schedule, cfg.beta, cfg.beta_warmup_steps)
    train_step = make_probunet_train_step(model, tx, cfg.lowres_scale,
                                          cfg.standardization, beta_fn, dtype,
                                          donate=cfg.donate_state, accum=cfg.accum,
                                          watch=cfg.watch_every > 0)
    eval_step = make_probunet_eval_step(model, cfg.lowres_scale, cfg.standardization, dtype)
    sample_fn = make_sample_fn(model, cfg.lowres_scale, cfg.standardization,
                               cfg.num_samples, dtype)
    crps_fn = None
    if cfg.eval_crps:
        # Built ONCE here: constructing it inside the epoch loop would create a
        # fresh jax.jit instance (and a full recompile) every epoch.
        from probunet_tpu.train import make_crps_eval_fn
        crps_fn = make_crps_eval_fn(model, cfg.lowres_scale, cfg.standardization,
                                    cfg.variables, cfg.crps_samples, dtype)

    # Device residency: dataset tensors + stats put once. The HR tensor is
    # time-sharded across the mesh when divisible (zero host memory growth),
    # else replicated; batch indices are sharded when batch % n_devices == 0.
    nd = mesh.devices.size
    def put_data(a):
        if nd > 1 and a.shape[0] % nd == 0:
            return put_batch(a, mesh)
        return put_replicated(a, mesh)
    def put_idx(idx):
        return put_batch(idx, mesh) if idx.shape[-1] % nd == 0 else put_replicated(idx, mesh)
    streaming = (not cfg.device_resident_data) and plan is None
    if plan is not None:
        # Multi-process: every step's global batch is assembled from this
        # process's local rows; the val split is replicated per process.
        stats_val_np = plan.split_stats(ds_val)
        hr_train = stats_train = hr_val = stats_val = None
    elif streaming:
        # Host-resident dataset; batches stream to HBM double-buffered,
        # already laid out on the mesh's batch sharding (no reshard in-step).
        from probunet_tpu.data.pipeline import compute_lr_stats_streaming
        stats_train_np = compute_lr_stats_streaming(ds_train.hr_np, cfg.lowres_scale,
                                                    cfg.standardization)
        hr_val = put_data(ds_val.hr_device())
        stats_val = put_replicated(ds_val.stats, mesh)
        hr_train = stats_train = None
    else:
        hr_train = put_data(ds_train.hr_device())
        hr_val = put_data(ds_val.hr_device())
        stats_train = put_replicated(ds_train.stats, mesh)
        stats_val = put_replicated(ds_val.stats, mesh)

    primary = plan is None or plan.is_primary
    os.makedirs(cfg.plotdir, exist_ok=True)
    metrics_path = cfg.metrics_path or os.path.join(cfg.plotdir, "metrics.jsonl")
    logger = MetricLogger(metrics_path if primary else None,
                          use_wandb=cfg.wandb and primary,
                          wandb_config=vars(cfg) if hasattr(cfg, "__dict__") else None)
    timer = StepTimer(cfg.profile_dir)
    rng = jax.random.key(cfg.seed + 1, impl=cfg.rng_impl)
    eval_rng = jax.random.key(cfg.eval_seed, impl=cfg.rng_impl)

    # Steps per epoch is constant across epochs (drop_remainder everywhere),
    # which makes exact mid-epoch resume a pure function of the restored step
    # counter: epoch = step // nb + 1, intra-epoch offset = step % nb — the
    # batch permutations are functions of (seed, epoch) and the step's noise
    # comes from fold_in(rng, state.step), so the continuation replays the
    # exact sequence an uninterrupted run would have taken.
    nb_epoch = (plan.steps_per_epoch if plan is not None
                else len(ds_train) // cfg.batch_size)
    ckpt_name = "probunet" if cfg.ds_model == "probabilistic_unet" else cfg.ds_model
    ckpt_dir = os.path.join(cfg.checkpoints_dir, ckpt_name)

    tr_losses, val_losses = [], []
    global_step = resume_step
    stopped = False
    for epoch in range(1, cfg.num_epochs + 1):
        if global_step >= epoch * nb_epoch:
            continue  # epoch fully covered by the resumed checkpoint
        offset = global_step - (epoch - 1) * nb_epoch
        desc = f"Train :: Epoch: {epoch}/{cfg.num_epochs}"

        # ---- train: one fused XLA program per step, dispatched async (the
        # scanned-epoch variant exists but carrying 1.2 GB of opt state through
        # lax.scan costs more than per-step dispatch on this runtime) ----
        running = []
        timer.reset()

        def after_step(metrics):
            """Shared per-step bookkeeping: logging, periodic checkpoints,
            max_steps stop. Returns True when the run must stop."""
            nonlocal global_step
            global_step += 1
            timer.tick(cfg.batch_size)
            running.append(metrics["train_loss"])
            if global_step % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()
                     if not k.startswith("gradnorm/")}
                m["samples_per_sec"] = timer.rate()
                logger.log(m, step=global_step)
            if cfg.watch_every and global_step % cfg.watch_every == 0:
                # wandb.watch parity: per-layer grad norms + param histograms
                logger.log({k: float(v) for k, v in metrics.items()
                            if k.startswith("gradnorm/")}, step=global_step)
                logger.log_param_histograms(state.params, step=global_step)
            if cfg.checkpoint_every and global_step % cfg.checkpoint_every == 0:
                save_checkpoint(ckpt_dir, jax.device_get(state))
            return bool(cfg.max_steps) and global_step >= cfg.max_steps

        if plan is not None:
            # Lockstep multi-process epoch: every process computes the same
            # global batch plan and contributes its local rows of each batch;
            # assembly runs in a background thread (double-buffered).
            batches = plan.epoch_batches(cfg.seed + epoch)[offset:]
            it = plan.batch_iter(ds_train.hr_np, batches, plan.stats_np)
            for item in progress(it, desc=desc, total=batches.shape[0]):
                state, metrics = train_step(state, item["hr"], item["stats"],
                                            item["idx"], rng)
                if after_step(metrics):
                    stopped = True
                    break
        elif streaming:
            from probunet_tpu.data.pipeline import stream_batches
            from probunet_tpu.parallel import batch_sharding, replicated
            # batch sharding only when divisible (same rule as put_idx)
            bsh = (batch_sharding(mesh) if cfg.batch_size % nd == 0
                   else replicated(mesh))
            it = stream_batches(ds_train.hr_np, cfg.batch_size, cfg.seed + epoch,
                                stats_train_np, cfg.standardization,
                                sharding=bsh,
                                replicated_sharding=replicated(mesh),
                                start_batch=offset)
            arange = put_idx(jnp.arange(cfg.batch_size))
            for item in progress(it, desc=desc, total=nb_epoch - offset):
                state, metrics = train_step(state, item["hr"], item.get("stats"), arange, rng)
                if after_step(metrics):
                    stopped = True
                    break
        else:
            batches = ds_train.epoch_indices(cfg.seed + epoch, cfg.batch_size)
            for bi in progress(range(offset, batches.shape[0]), desc=desc):
                idx = put_idx(jnp.asarray(batches[bi]))
                state, metrics = train_step(state, hr_train, stats_train, idx, rng)
                if after_step(metrics):
                    stopped = True
                    break
        epoch_tr = float(jnp.mean(jnp.stack(running))) if running else float("nan")
        tr_losses.append(epoch_tr)
        if stopped:
            # max_steps interrupt: checkpoint the exact position and leave;
            # the next --resume run continues with the identical sequence
            save_checkpoint(ckpt_dir, jax.device_get(state))
            break

        # ---- eval (stochastic, seeded; reference eval_probunet_model) ----
        vloss = []
        if plan is not None:
            vbatches = plan.replicated_batches(len(ds_val))
            for bi in range(vbatches.shape[0]):
                item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                         replicated_source=True)
                m = eval_step(state.params, item["hr"], item["stats"], item["idx"],
                              jax.random.fold_in(eval_rng, bi), np.float32(cfg.beta))
                vloss.append(m["val_loss"])
        else:
            vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
            for bi in range(vbatches.shape[0]):
                idx = put_idx(jnp.asarray(vbatches[bi]))
                m = eval_step(state.params, hr_val, stats_val, idx,
                              jax.random.fold_in(eval_rng, bi), jnp.float32(cfg.beta))
                vloss.append(m["val_loss"])
        epoch_val = float(jnp.mean(jnp.stack(vloss)))
        val_losses.append(epoch_val)
        logger.log({"epoch": epoch, "epoch_train_loss": epoch_tr, "val_loss": epoch_val},
                   step=global_step)

        # ---- optional ensemble CRPS in physical units (reference defines
        # crps_empirical but never wires it; BASELINE config #3) ----
        if crps_fn is not None:
            acc = {}
            nb_crps = _crps_batches(cfg, vbatches.shape[0])
            for bi in range(nb_crps):
                rng_b = jax.random.fold_in(eval_rng, 10_000 + bi)
                if plan is not None:
                    item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                             replicated_source=True)
                    m = crps_fn(state.params, item["hr"], item["stats"],
                                item["idx"], rng_b)
                else:
                    idx = put_idx(jnp.asarray(vbatches[bi]))
                    m = crps_fn(state.params, hr_val, stats_val, idx, rng_b)
                for k, v in m.items():
                    acc.setdefault(k, []).append(float(v))
            crps_metrics = {k: float(np.mean(v)) for k, v in acc.items()}
            crps_metrics["crps_batches_evaluated"] = nb_crps
            logger.log(crps_metrics, step=global_step)

        # ---- sample + plot every 2 epochs (reference main.py:125-134) ----
        if make_plots and epoch % 2 == 0:
            _plot_probunet_samples(cfg, model, state, ds_test, sample_fn, mesh, epoch,
                                   plan=plan)

        # called from ALL processes: orbax multi-process save coordinates via
        # its own cross-process barriers (primary-host writes internally) —
        # gating it to one process deadlocks the barrier
        save_checkpoint(ckpt_dir, jax.device_get(state))

    if make_plots and primary:
        from probunet_tpu.viz import plot_loss_curves
        plot_loss_curves(tr_losses, val_losses, os.path.join(cfg.plotdir, "loss.png"))
    logger.close()
    return {"state": state, "tr_losses": tr_losses, "val_losses": val_losses,
            "samples_per_sec": timer.rate()}


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
    LR-interp conditioning image."""
    from probunet_tpu.models import EDMPrecond

    return EDMPrecond(
        img_resolution=tuple(cfg.resolution),
        in_channels=2 * cfg.nvars,
        out_channels=cfg.nvars,
        model_channels=cfg.model_channels,
        channel_mult=tuple(cfg.channel_mult),
        num_blocks=cfg.num_blocks,
        attn_resolutions=tuple(cfg.attn_resolutions),
        dropout=cfg.dropout)


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
    from probunet_tpu.parallel.multihost import make_plan
    from probunet_tpu.train import (make_edm_crps_eval_fn, make_edm_eval_step,
                                    make_edm_sample_fn, make_edm_train_step)

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    datasets = datasets or load_datasets(cfg)
    ds_train, ds_val, ds_test = datasets["train"], datasets["val"], datasets["test"]
    dtype = _compute_dtype(cfg)
    # Lockstep multi-process plan (global stats + stratified global batches),
    # exactly as in train_probunet — the EDM step shares its signature, so the
    # DP multi-host machinery serves the diffusion driver unchanged.
    plan = make_plan(cfg, ds_train, mesh)

    model = build_edm_model(cfg)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer,
                        state_dtype=cfg.opt_state_dtype)
    state = init_edm_state(cfg, model, tx)
    resume_step = 0
    if cfg.resume:
        from probunet_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(cfg.resume, state)
        resume_step = int(state.step)
        print(f"resumed from {cfg.resume} at step {resume_step}")
    state = plan.put_state(state) if plan else put_replicated(state, mesh)

    train_step = make_edm_train_step(model, tx, cfg.lowres_scale, cfg.standardization,
                                     compute_dtype=dtype, donate=cfg.donate_state)
    eval_step = make_edm_eval_step(model, cfg.lowres_scale, cfg.standardization,
                                   compute_dtype=dtype)
    sample_fn = make_edm_sample_fn(model, cfg.lowres_scale, cfg.standardization,
                                   cfg.num_samples, cfg.edm_steps,
                                   compute_dtype=dtype)
    crps_fn = None
    if cfg.eval_crps:
        # built once (fresh jit per epoch = recompile; loop.py:146 rule)
        crps_fn = make_edm_crps_eval_fn(model, cfg.lowres_scale,
                                        cfg.standardization, cfg.variables,
                                        cfg.crps_samples, cfg.edm_steps,
                                        compute_dtype=dtype)

    nd = mesh.devices.size
    def put_data(a):
        if nd > 1 and a.shape[0] % nd == 0:
            return put_batch(a, mesh)
        return put_replicated(a, mesh)
    def put_idx(idx):
        return put_batch(idx, mesh) if idx.shape[-1] % nd == 0 else put_replicated(idx, mesh)
    hr_train = stats_train = hr_val = stats_val = None
    if plan is not None:
        stats_val_np = plan.split_stats(ds_val)
    else:
        hr_train = put_data(ds_train.hr_device())
        hr_val = put_data(ds_val.hr_device())
        stats_train = put_replicated(ds_train.stats, mesh)
        stats_val = put_replicated(ds_val.stats, mesh)

    primary = plan is None or plan.is_primary
    os.makedirs(cfg.plotdir, exist_ok=True)
    metrics_path = cfg.metrics_path or os.path.join(cfg.plotdir, "metrics_edm.jsonl")
    logger = MetricLogger(metrics_path if primary else None,
                          use_wandb=cfg.wandb and primary)
    timer = StepTimer(cfg.profile_dir)
    rng = jax.random.key(cfg.seed + 3, impl=cfg.rng_impl)
    eval_rng = jax.random.key(cfg.eval_seed, impl=cfg.rng_impl)

    # Exact resume, same mechanism as train_probunet: steps/epoch is constant,
    # so the restored step counter determines (epoch, intra-epoch offset) and
    # the continuation replays the identical batch/noise sequence.
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
        desc = f"Train(edm) :: Epoch: {epoch}/{cfg.num_epochs}"

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
            it = plan.batch_iter(ds_train.hr_np, batches, plan.stats_np)
            for item in progress(it, desc=desc, total=batches.shape[0]):
                state, metrics = train_step(state, item["hr"], item["stats"],
                                            item["idx"], rng)
                after_step(metrics)
        else:
            batches = ds_train.epoch_indices(cfg.seed + epoch, cfg.batch_size)
            for bi in progress(range(offset, batches.shape[0]), desc=desc):
                idx = put_idx(jnp.asarray(batches[bi]))
                state, metrics = train_step(state, hr_train, stats_train, idx, rng)
                after_step(metrics)
        tr_losses.append(float(jnp.mean(jnp.stack(running))) if running
                         else float("nan"))

        vloss = []
        if plan is not None:
            vbatches = plan.replicated_batches(len(ds_val))
            for bi in range(vbatches.shape[0]):
                item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                         replicated_source=True)
                m = eval_step(state.params, item["hr"], item["stats"], item["idx"],
                              jax.random.fold_in(eval_rng, bi))
                vloss.append(m["val_loss"])
        else:
            vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
            for bi in range(vbatches.shape[0]):
                idx = put_idx(jnp.asarray(vbatches[bi]))
                m = eval_step(state.params, hr_val, stats_val, idx,
                              jax.random.fold_in(eval_rng, bi))
                vloss.append(m["val_loss"])
        val_losses.append(float(jnp.mean(jnp.stack(vloss))))
        logger.log({"epoch": epoch, "epoch_train_loss": tr_losses[-1],
                    "val_loss": val_losses[-1]}, step=step_count)

        # ---- optional Heun-ensemble CRPS (same metric surface as probunet) ----
        if crps_fn is not None:
            acc = {}
            nb_crps = _crps_batches(cfg, vbatches.shape[0])
            for bi in range(nb_crps):
                rng_b = jax.random.fold_in(eval_rng, 10_000 + bi)
                if plan is not None:
                    item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                             replicated_source=True)
                    m = crps_fn(state.params, item["hr"], item["stats"],
                                item["idx"], rng_b)
                else:
                    idx = put_idx(jnp.asarray(vbatches[bi]))
                    m = crps_fn(state.params, hr_val, stats_val, idx, rng_b)
                for k, v in m.items():
                    acc.setdefault(k, []).append(float(v))
            crps_metrics = {k: float(np.mean(v)) for k, v in acc.items()}
            crps_metrics["crps_batches_evaluated"] = nb_crps
            logger.log(crps_metrics, step=step_count)

        if make_plots and epoch % 2 == 0:
            # make_edm_sample_fn shares make_sample_fn's surface, so the
            # prob-U-Net plot helper serves the diffusion ensemble unchanged
            _plot_probunet_samples(cfg, model, state, ds_test, sample_fn, mesh, epoch,
                                   plan=plan)

        # all processes: orbax coordinates multi-process saves itself
        save_checkpoint(os.path.join(cfg.checkpoints_dir, "edm"), jax.device_get(state))

    if make_plots and primary:
        from probunet_tpu.viz import plot_loss_curves
        plot_loss_curves(tr_losses, val_losses, os.path.join(cfg.plotdir, "loss_edm.png"))
    logger.close()
    return {"state": state, "tr_losses": tr_losses, "val_losses": val_losses,
            "samples_per_sec": timer.rate()}


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
                    bottleneck_attention=False, dropout=cfg.dropout)
    if cfg.ds_model == "linearcnn":
        return LinearCNN(resolution=tuple(cfg.resolution), in_channels=cfg.nvars,
                         ds_factor=cfg.lowres_scale)
    raise ValueError(f"unknown ds_model {cfg.ds_model!r}")


def train_baseline(cfg: Config, datasets: Optional[Dict[str, ClimexDataset]] = None,
                   make_plots: bool = True) -> Dict:
    """The reference ``baseline/main.py`` pipeline (deterministic models + BCSD)."""
    from probunet_tpu.parallel.multihost import make_plan

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    datasets = datasets or load_datasets(cfg)
    ds_train, ds_val = datasets["train"], datasets["val"]
    dtype = _compute_dtype(cfg)

    if cfg.ds_model == "bcsd":
        return run_bcsd(cfg, datasets)
    if cfg.ds_model == "edm":
        return train_edm(cfg, datasets, make_plots)
    if cfg.ds_model == "vae":
        # the conv-VAE shares the probabilistic (ELBO) surface, so it trains
        # through the prob-U-Net loop (reference lists vae under the
        # deterministic driver's choices but never dispatches it)
        return train_probunet(cfg, datasets, make_plots)

    plan = make_plan(cfg, ds_train, mesh)
    model = build_baseline_model(cfg)
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer,
                        state_dtype=cfg.opt_state_dtype)
    h, w = cfg.resolution
    rngs = {"params": jax.random.key(cfg.seed), "dropout": jax.random.key(cfg.seed + 1)}
    label_cols = 2 if cfg.timetransform == "cyclic" else 1  # time_features width
    variables = model.init(rngs, jnp.zeros((1, h, w, cfg.nvars)),
                           class_labels=jnp.zeros((1, label_cols)), train=False)
    state = create_train_state(variables["params"], tx)
    if cfg.resume:
        from probunet_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(cfg.resume, state)
        print(f"resumed from {cfg.resume} at step {int(state.step)}")
    state = plan.put_state(state) if plan else put_replicated(state, mesh)

    train_step = make_deterministic_train_step(model, tx, cfg.lowres_scale,
                                               cfg.standardization, dtype,
                                               donate=cfg.donate_state,
                                               timetransform=cfg.timetransform,
                                               watch=cfg.watch_every > 0)
    eval_step = make_deterministic_eval_step(model, cfg.lowres_scale, cfg.standardization,
                                             cfg.variables, reconstruct=False,
                                             timetransform=cfg.timetransform)
    mae_step = make_deterministic_eval_step(model, cfg.lowres_scale, cfg.standardization,
                                            cfg.variables, reconstruct=True, loss="mae",
                                            timetransform=cfg.timetransform)

    # Same data-residency policy as train_probunet: time-shard the dataset
    # tensor across the mesh when divisible, or stream host->device batches.
    nd = mesh.devices.size
    def put_data(a):
        if nd > 1 and a.shape[0] % nd == 0:
            return put_batch(a, mesh)
        return put_replicated(a, mesh)
    def put_idx(idx):
        return put_batch(idx, mesh) if idx.shape[-1] % nd == 0 else put_replicated(idx, mesh)
    streaming = (not cfg.device_resident_data) and plan is None
    hr_train = stats_train = hr_val = stats_val = ts_train = ts_val = None
    if plan is not None:
        stats_val_np = plan.split_stats(ds_val)
    elif streaming:
        from probunet_tpu.data.pipeline import compute_lr_stats_streaming
        stats_train_np = compute_lr_stats_streaming(ds_train.hr_np, cfg.lowres_scale,
                                                    cfg.standardization)
    else:
        hr_train = put_data(ds_train.hr_device())
        stats_train = put_replicated(ds_train.stats, mesh)
    if plan is None:
        hr_val = put_data(ds_val.hr_device())
        stats_val = put_replicated(ds_val.stats, mesh)
        ts_train = jnp.asarray(ds_train.timestamps_np)
        ts_val = jnp.asarray(ds_val.timestamps_np)

    primary = plan is None or plan.is_primary
    os.makedirs(cfg.plotdir, exist_ok=True)
    metrics_path = cfg.metrics_path or os.path.join(cfg.plotdir, "metrics_baseline.jsonl")
    logger = MetricLogger(metrics_path if primary else None,
                          use_wandb=cfg.wandb and primary)
    rng = jax.random.key(cfg.seed + 2)

    tr_losses = {v: [] for v in cfg.variables}
    val_losses = {v: [] for v in cfg.variables}
    step_count = 0

    def record(metrics):
        """Shared per-step bookkeeping across the three ingest branches."""
        nonlocal step_count
        step_count += 1
        for i, v in enumerate(cfg.variables):
            tr_losses[v].append(float(metrics[f"train_loss_var{i}"]))
        if step_count % cfg.log_every == 0:
            logger.log({k: float(x) for k, x in metrics.items()
                        if not k.startswith("gradnorm/")}, step=step_count)
        if cfg.watch_every and step_count % cfg.watch_every == 0:
            # wandb.watch parity (reference baseline/main.py:57-58)
            logger.log({k: float(x) for k, x in metrics.items()
                        if k.startswith("gradnorm/")}, step=step_count)
            logger.log_param_histograms(state.params, step=step_count)

    for epoch in range(1, cfg.num_epochs + 1):
        desc = f"Train :: Epoch: {epoch}/{cfg.num_epochs}"
        if plan is not None:
            batches = plan.epoch_batches(cfg.seed + epoch)
            it = plan.batch_iter(ds_train.hr_np, batches, plan.stats_np,
                                 timestamps_np=ds_train.timestamps_np)
            for item in progress(it, desc=desc, total=batches.shape[0]):
                state, metrics = train_step(state, item["hr"], item["stats"],
                                            item["idx"], item["timestamps"], rng)
                record(metrics)
        elif streaming:
            from probunet_tpu.data.pipeline import stream_batches
            from probunet_tpu.parallel import batch_sharding, replicated
            nb = len(ds_train) // cfg.batch_size
            bsh = (batch_sharding(mesh) if cfg.batch_size % nd == 0
                   else replicated(mesh))
            it = stream_batches(ds_train.hr_np, cfg.batch_size, cfg.seed + epoch,
                                stats_train_np, cfg.standardization,
                                timestamps_np=ds_train.timestamps_np,
                                sharding=bsh,
                                replicated_sharding=replicated(mesh))
            arange = put_idx(jnp.arange(cfg.batch_size))
            for item in progress(it, desc=desc, total=nb):
                state, metrics = train_step(state, item["hr"], item.get("stats"),
                                            arange, item["timestamps"], rng)
                record(metrics)
        else:
            batches = ds_train.epoch_indices(cfg.seed + epoch, cfg.batch_size)
            for bi in progress(range(batches.shape[0]), desc=desc):
                idx = jnp.asarray(batches[bi])
                state, metrics = train_step(state, hr_train, stats_train,
                                            put_idx(idx), ts_train[idx], rng)
                record(metrics)
        if plan is not None:
            vbatches = plan.replicated_batches(len(ds_val))
            for bi in range(vbatches.shape[0]):
                item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                         timestamps_np=ds_val.timestamps_np,
                                         replicated_source=True)
                m = eval_step(state.params, item["hr"], item["stats"], item["idx"],
                              item["timestamps"])
                for v in cfg.variables:
                    val_losses[v].append(float(m[f"eval_{v}"]))
        else:
            vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
            for bi in range(vbatches.shape[0]):
                idx = jnp.asarray(vbatches[bi])
                m = eval_step(state.params, hr_val, stats_val, put_idx(idx), ts_val[idx])
                for v in cfg.variables:
                    val_losses[v].append(float(m[f"eval_{v}"]))

    # sample + plot_batch (reference baseline/main.py:88-90, trainmodel.py:204-233)
    if make_plots and primary:
        if plan is not None:
            # plot locally on the primary: host params + this process's full
            # val copy (no mesh collectives in the plot path)
            from probunet_tpu.train.state import TrainState
            state_h = TrainState(jax.device_get(state.params), None, 0)
            hr_v = jnp.asarray(ds_val.hr_np)
            st_v = None if stats_val_np is None else tuple(
                jnp.asarray(s) for s in stats_val_np)
            _plot_baseline_samples(cfg, model, state_h, ds_val, hr_v, st_v,
                                   jnp.asarray(ds_val.timestamps_np))
        else:
            _plot_baseline_samples(cfg, model, state, ds_val, hr_val, stats_val, ts_val)
        _plot_baseline_losses(cfg, tr_losses, val_losses)

    # checkpoint (reference baseline/main.py:108-109) — all processes: orbax
    # coordinates multi-process saves itself (see train_probunet note)
    save_checkpoint(os.path.join(cfg.checkpoints_dir, cfg.ds_model),
                    jax.device_get(state))

    # final physical-unit MAE (reference baseline/main.py:112-115)
    mae = {v: [] for v in cfg.variables}
    if plan is not None:
        vbatches = plan.replicated_batches(len(ds_val))
        for bi in range(vbatches.shape[0]):
            item = plan.device_batch(ds_val.hr_np, vbatches[bi], stats_val_np,
                                     timestamps_np=ds_val.timestamps_np,
                                     replicated_source=True)
            m = mae_step(state.params, item["hr"], item["stats"], item["idx"],
                         item["timestamps"])
            for v in cfg.variables:
                mae[v].append(float(m[f"eval_{v}"]))
    else:
        vbatches = ds_val.epoch_indices(0, cfg.batch_size, shuffle=False)
        for bi in range(vbatches.shape[0]):
            idx = jnp.asarray(vbatches[bi])
            m = mae_step(state.params, hr_val, stats_val, put_idx(idx), ts_val[idx])
            for v in cfg.variables:
                mae[v].append(float(m[f"eval_{v}"]))
    mae = {v: float(np.mean(x)) for v, x in mae.items()}
    if primary:
        for v in cfg.variables:
            print(f"MAE for {v} on validation data: ", mae[v])
    logger.log({f"mae_{v}": mae[v] for v in cfg.variables}, step=step_count)
    logger.close()
    return {"state": state, "tr_losses": tr_losses, "val_losses": val_losses, "mae": mae}


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
    """Smoothing for loss-curve plots (reference baseline/main.py:12-13)."""
    x = np.asarray(x)
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

"""One training engine for every experiment driver.

The reference carries two hand-copied epoch loops
(train_prob_unet_model.py:60-148 and trainmodel.py:119-304); by round 4 this
repo had grown four (DP prob-U-Net, EDM diffusion, deterministic baseline,
spatially-sharded) that had already drifted — only some honored
``--checkpoint_every`` / ``--max_steps`` / ``--watch_every`` / streaming
ingest / exact resume. This module extracts the ONE loop they all share; the
drivers in :mod:`probunet_tpu.train.loop` and
:mod:`probunet_tpu.parallel.spatial_train` are thin configurations of it, so
every lifecycle feature lands in all four at once
(tests/test_engine_matrix.py asserts the feature matrix).

Owned here:

- mesh + multi-host plan construction, optimizer/state init, checkpoint
  restore, global (replicated) state placement;
- **ingest-mode selection**, uniform across drivers: lockstep multi-process
  plan batches (background-thread global-batch assembly), double-buffered
  host->device streaming (``--device_resident_data false``), or the default
  device-resident dataset tensor + per-step index gather;
- the epoch loop: per-step bookkeeping (``--log_every`` cadence,
  ``--watch_every`` wandb.watch parity, ``--checkpoint_every`` step-granular
  checkpoints, ``--max_steps`` stop), seeded stochastic eval at the
  **scheduled** β (train and val ELBOs stay comparable under β annealing),
  full-split ensemble CRPS with the evaluated-batch count always logged,
  sample-plot cadence (every 2 epochs, reference main.py:125-134), epoch-end
  checkpoints, and EXACT mid-epoch resume: steps/epoch is constant
  (drop_remainder everywhere), so the restored step counter alone determines
  (epoch, intra-epoch offset) and the continuation replays the identical
  batch/noise sequence an uninterrupted run would have taken.

Driver-specific pieces — model builders, fused step functions, plotting and
final-metric tails — plug in through :class:`EngineSpec` / :class:`EngineFns`.
Items flowing through the loop are dicts with keys ``hr`` (the batch or the
full dataset tensor), ``stats`` (standardization statistics or None), ``idx``
(batch gather indices) and optionally ``timestamps``; each driver's
``train_call``/``eval_call`` adapt them to its fused step signature.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.parallel import make_mesh, put_batch, put_replicated
from probunet_tpu.parallel.mesh import batch_sharding, replicated
from probunet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from probunet_tpu.train.state import TrainState, make_optimizer
from probunet_tpu.utils.logging import MetricLogger, StepTimer, progress


@dataclasses.dataclass
class EngineFns:
    """Driver plug-ins, built once per run by ``EngineSpec.make_fns(ctx)``.

    ``train_call(state, item, rng) -> (state, metrics)`` is required; metrics
    must contain ``train_loss`` (device scalar — the engine keeps dispatch
    async and only fetches at the logging cadence). Everything else is
    optional."""

    train_call: Callable[[TrainState, Dict, jax.Array], Any]
    # (params, item, rng, beta) -> metrics dict; beta is None unless
    # eval_beta_fn is set
    eval_call: Optional[Callable] = None
    # global_step -> scheduled β passed to eval_call (keeps annealed train/val
    # ELBOs comparable; logged as val_beta)
    eval_beta_fn: Optional[Callable] = None
    crps_call: Optional[Callable] = None       # (params, item, rng) -> metrics
    crps_epoch_fn: Optional[Callable] = None   # (state, eval_rng) -> metrics
    plot_fn: Optional[Callable] = None         # (state, epoch) -> None
    # (state, logger, global_step) -> dict merged into the result (runs before
    # logger.close; e.g. the baseline's final physical-unit MAE)
    final_fn: Optional[Callable] = None
    on_train_metrics: Optional[Callable] = None  # per-step hook (device metrics)
    on_val_metrics: Optional[Callable] = None    # per-val-batch hook (floats)


@dataclasses.dataclass
class EngineSpec:
    """Static driver description: names, RNG stream, and the factories."""

    name: str                    # checkpoint subdirectory
    metrics_filename: str        # default metrics JSONL name under plotdir
    init_state: Callable         # (tx) -> host TrainState
    make_fns: Callable           # (EngineCtx) -> EngineFns
    desc: str = "Train"          # progress-bar prefix
    rng_offset: int = 1          # train noise stream = key(seed + rng_offset)
    needs_timestamps: bool = False
    build_mesh: Optional[Callable] = None   # (cfg) -> Mesh
    build_plan: Optional[Callable] = None   # (cfg, ds_train, mesh) -> plan|None
    wandb_config: bool = False   # pass vars(cfg) as the wandb run config
    loss_curve: Optional[str] = None  # filename for the train/val loss plot


def load_datasets(cfg: Config) -> Dict[str, Any]:
    """Build the three split datasets. Multi-host: each process ingests only
    its contiguous shard of the TRAIN years (per-host file sharding, the dask
    role in reference main.py:12); val/test stay replicated so every process
    evaluates the same data."""
    from probunet_tpu.data.dataset import ClimexDataset
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


def _data_axis(mesh) -> str:
    return "data" if "data" in mesh.axis_names else mesh.axis_names[0]


def _crps_batches(cfg: Config, n_val_batches: int) -> int:
    """How many val batches the per-epoch CRPS eval covers: the FULL split by
    default; ``--crps_eval_batches N`` bounds the cost for huge splits. The
    count is always logged (crps_batches_evaluated) so a truncated metric can
    never masquerade as the split metric."""
    if cfg.crps_eval_batches:
        return min(n_val_batches, int(cfg.crps_eval_batches))
    return n_val_batches


class EngineCtx:
    """Per-run ingest state shared between the engine loop and the driver's
    ``make_fns``: the mesh/plan, device residency arrays, and the item
    builders for train/val batches."""

    def __init__(self, cfg: Config, mesh, plan, datasets, tx,
                 needs_timestamps: bool):
        self.cfg = cfg
        self.mesh = mesh
        self.plan = plan
        self.datasets = datasets
        self.tx = tx
        self.needs_timestamps = needs_timestamps
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.primary = plan is None or plan.is_primary
        ds_train, ds_val = datasets["train"], datasets["val"]
        self.ds_train, self.ds_val = ds_train, ds_val
        # "auto" residency: resident for the DP fast path, streaming for
        # spatial/2d (whose reason to exist is tiles beyond resident
        # placement — replicating a non-divisible HR tensor to every chip
        # would defeat the mode); True/False force it (cfg.resident_data).
        self.streaming = (not cfg.resident_data) and plan is None

        axis = _data_axis(mesh)
        self._axis = axis
        self._axis_size = int(mesh.shape[axis])
        self._batch_sh = (batch_sharding(mesh, axis)
                          if cfg.batch_size % self._axis_size == 0
                          else replicated(mesh))
        self._repl_sh = replicated(mesh)

        # ---- device residency policy ----
        self.hr_train = self.stats_train = None
        self.hr_val = self.stats_val = None
        self.ts_train = self.ts_val = None
        self.stats_train_np = self.stats_val_np = None
        self._stats_val_repl = None
        if plan is not None:
            # Multi-process lockstep: every step's global batch is assembled
            # from this process's local rows; val stays replicated per process.
            self.stats_val_np = plan.split_stats(ds_val)
        elif self.streaming:
            # Host-resident dataset; batches stream to HBM double-buffered,
            # already laid out on the mesh's batch sharding.
            from probunet_tpu.data.pipeline import compute_lr_stats_streaming
            self.stats_train_np = compute_lr_stats_streaming(
                ds_train.hr_np, cfg.lowres_scale, cfg.standardization)
            self.stats_val_np = compute_lr_stats_streaming(
                ds_val.hr_np, cfg.lowres_scale, cfg.standardization)
        else:
            # Device-resident dataset tensors (time-sharded across the mesh
            # when divisible — zero host memory growth); stats replicated.
            self.hr_train = self._put_data(ds_train.hr_device())
            self.hr_val = self._put_data(ds_val.hr_device())
            self.stats_train = put_replicated(ds_train.stats, mesh)
            self.stats_val = put_replicated(ds_val.stats, mesh)
        if plan is None and needs_timestamps:
            self.ts_train = jnp.asarray(ds_train.timestamps_np)
            self.ts_val = jnp.asarray(ds_val.timestamps_np)

    # ---- placement helpers ----
    def _put_data(self, a):
        if self._axis_size > 1 and a.shape[0] % self._axis_size == 0:
            return put_batch(a, self.mesh, self._axis)
        return put_replicated(a, self.mesh)

    def put_idx(self, idx):
        if idx.shape[-1] % self._axis_size == 0:
            return put_batch(idx, self.mesh, self._axis)
        return put_replicated(idx, self.mesh)

    # ---- epoch geometry ----
    @property
    def steps_per_epoch(self) -> int:
        if self.plan is not None:
            return self.plan.steps_per_epoch
        return len(self.ds_train) // self.cfg.batch_size

    # ---- train ingest ----
    def train_items(self, epoch: int, offset: int):
        """(iterator of item dicts, total) for one epoch, starting at
        ``offset`` (mid-epoch resume). All three ingest modes overlap host
        work with device compute (plan: background assembly thread;
        streaming: DevicePrefetcher double buffering; resident: the only host
        work is the O(batch) index upload)."""
        cfg = self.cfg
        ts_np = self.ds_train.timestamps_np if self.needs_timestamps else None
        if self.plan is not None:
            batches = self.plan.epoch_batches(cfg.seed + epoch)[offset:]
            it = self.plan.batch_iter(self.ds_train.hr_np, batches,
                                      self.plan.stats_np, timestamps_np=ts_np)
            return it, batches.shape[0]
        if self.streaming:
            from probunet_tpu.data.pipeline import stream_batches
            it = stream_batches(self.ds_train.hr_np, cfg.batch_size,
                                cfg.seed + epoch, self.stats_train_np,
                                cfg.standardization, sharding=self._batch_sh,
                                replicated_sharding=self._repl_sh,
                                timestamps_np=ts_np, start_batch=offset)
            arange = self.put_idx(jnp.arange(cfg.batch_size))

            def gen():
                for item in it:
                    item.setdefault("stats", None)
                    item["idx"] = arange
                    yield item

            return gen(), self.steps_per_epoch - offset
        batches = self.ds_train.epoch_indices(cfg.seed + epoch, cfg.batch_size)

        def gen():
            for bi in range(offset, batches.shape[0]):
                idx = jnp.asarray(batches[bi])
                item = {"hr": self.hr_train, "stats": self.stats_train,
                        "idx": self.put_idx(idx)}
                if self.ts_train is not None:
                    item["timestamps"] = self.ts_train[idx]
                yield item

        return gen(), batches.shape[0] - offset

    # ---- val ingest ----
    def val_batches(self) -> np.ndarray:
        if self.plan is not None:
            return self.plan.replicated_batches(len(self.ds_val))
        return self.ds_val.epoch_indices(0, self.cfg.batch_size, shuffle=False)

    def val_item(self, gids: np.ndarray) -> Dict:
        cfg = self.cfg
        ts_np = self.ds_val.timestamps_np if self.needs_timestamps else None
        if self.plan is not None:
            return self.plan.device_batch(self.ds_val.hr_np, gids,
                                          self.stats_val_np, timestamps_np=ts_np,
                                          replicated_source=True)
        if self.streaming:
            idx = np.asarray(gids)
            item = {"hr": jax.device_put(self.ds_val.hr_np[idx], self._batch_sh)}
            std = cfg.standardization
            if self.stats_val_np is None:
                item["stats"] = None
            elif std in ("pertimestep", "minmax"):
                item["stats"] = tuple(
                    jax.device_put(s[idx], self._batch_sh) for s in self.stats_val_np)
            else:
                if self._stats_val_repl is None:
                    self._stats_val_repl = tuple(
                        jax.device_put(np.asarray(s, np.float32), self._repl_sh)
                        for s in self.stats_val_np)
                item["stats"] = self._stats_val_repl
            item["idx"] = self.put_idx(jnp.arange(len(idx)))
            if ts_np is not None:
                item["timestamps"] = jax.device_put(ts_np[idx], self._batch_sh)
            return item
        idx = jnp.asarray(gids)
        item = {"hr": self.hr_val, "stats": self.stats_val, "idx": self.put_idx(idx)}
        if self.ts_val is not None:
            item["timestamps"] = self.ts_val[idx]
        return item


def run_training(cfg: Config, spec: EngineSpec, datasets=None,
                 make_plots: bool = True) -> Dict:
    """The shared epoch loop. Returns {state, tr_losses, val_losses,
    samples_per_sec} plus whatever the driver's ``final_fn`` adds."""
    from probunet_tpu.parallel.multihost import make_plan

    mesh = (spec.build_mesh(cfg) if spec.build_mesh
            else make_mesh(cfg.mesh_shape, cfg.mesh_axes))
    datasets = datasets or load_datasets(cfg)
    ds_train = datasets["train"]
    plan = (spec.build_plan(cfg, ds_train, mesh) if spec.build_plan
            else make_plan(cfg, ds_train, mesh))

    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer,
                        state_dtype=cfg.opt_state_dtype)
    state = spec.init_state(tx)
    resume_step = 0
    if cfg.resume:
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

    ctx = EngineCtx(cfg, mesh, plan, datasets, tx, spec.needs_timestamps)
    fns = spec.make_fns(ctx)

    primary = ctx.primary
    os.makedirs(cfg.plotdir, exist_ok=True)
    metrics_path = cfg.metrics_path or os.path.join(cfg.plotdir, spec.metrics_filename)
    logger = MetricLogger(metrics_path if primary else None,
                          use_wandb=cfg.wandb and primary,
                          wandb_config=vars(cfg) if spec.wandb_config else None)
    timer = StepTimer(cfg.profile_dir)
    rng = jax.random.key(cfg.seed + spec.rng_offset, impl=cfg.rng_impl)
    eval_rng = jax.random.key(cfg.eval_seed, impl=cfg.rng_impl)

    nb_epoch = ctx.steps_per_epoch
    ckpt_dir = os.path.join(cfg.checkpoints_dir, spec.name)
    tr_losses, val_losses = [], []
    global_step = resume_step
    stopped = False
    for epoch in range(1, cfg.num_epochs + 1):
        if global_step >= epoch * nb_epoch:
            continue  # epoch fully covered by the resumed checkpoint
        offset = global_step - (epoch - 1) * nb_epoch
        desc = f"{spec.desc} :: Epoch: {epoch}/{cfg.num_epochs}"
        running = []
        timer.reset()

        def after_step(metrics):
            """Shared per-step bookkeeping: logging, watch cadence, periodic
            checkpoints, max_steps stop. Returns True when the run must stop."""
            nonlocal global_step
            global_step += 1
            timer.tick(cfg.batch_size)
            running.append(metrics["train_loss"])
            if fns.on_train_metrics is not None:
                fns.on_train_metrics(metrics)
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

        items, total = ctx.train_items(epoch, offset)
        for item in progress(items, desc=desc, total=total):
            state, metrics = fns.train_call(state, item, rng)
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

        # ---- eval (stochastic, seeded; scheduled β when the driver has one
        # so annealed runs log comparable train/val losses) ----
        vbatches = ctx.val_batches()
        beta = None
        vmean: Dict[str, float] = {}
        if fns.eval_call is not None:
            if fns.eval_beta_fn is not None:
                beta = fns.eval_beta_fn(global_step)
            vacc: Dict[str, list] = {}
            for bi in range(vbatches.shape[0]):
                m = fns.eval_call(state.params, ctx.val_item(vbatches[bi]),
                                  jax.random.fold_in(eval_rng, bi), beta)
                mf = {k: float(v) for k, v in m.items()}
                if fns.on_val_metrics is not None:
                    fns.on_val_metrics(mf)
                for k, v in mf.items():
                    vacc.setdefault(k, []).append(v)
            vmean = {k: float(np.mean(v)) for k, v in vacc.items()}
        if "val_loss" in vmean:
            val_losses.append(vmean["val_loss"])
        rec = {"epoch": epoch, "epoch_train_loss": epoch_tr, **vmean}
        if beta is not None:
            rec["val_beta"] = float(beta)
        logger.log(rec, step=global_step)

        # ---- optional ensemble CRPS in physical units (reference defines
        # crps_empirical but never wires it; BASELINE config #3) ----
        if fns.crps_epoch_fn is not None:
            logger.log(fns.crps_epoch_fn(state, eval_rng), step=global_step)
        elif fns.crps_call is not None:
            acc: Dict[str, list] = {}
            nb_crps = _crps_batches(cfg, vbatches.shape[0])
            for bi in range(nb_crps):
                rng_b = jax.random.fold_in(eval_rng, 10_000 + bi)
                m = fns.crps_call(state.params, ctx.val_item(vbatches[bi]), rng_b)
                for k, v in m.items():
                    acc.setdefault(k, []).append(float(v))
            crps_metrics = {k: float(np.mean(v)) for k, v in acc.items()}
            crps_metrics["crps_batches_evaluated"] = nb_crps
            logger.log(crps_metrics, step=global_step)

        # ---- sample + plot every 2 epochs (reference main.py:125-134) ----
        if make_plots and fns.plot_fn is not None and epoch % 2 == 0:
            fns.plot_fn(state, epoch)

        # called from ALL processes: orbax multi-process save coordinates via
        # its own cross-process barriers (primary-host writes internally) —
        # gating it to one process deadlocks the barrier
        save_checkpoint(ckpt_dir, jax.device_get(state))

    result = {"state": state, "tr_losses": tr_losses, "val_losses": val_losses,
              "samples_per_sec": timer.rate()}
    if fns.final_fn is not None:
        extra = fns.final_fn(state, logger, global_step)
        if extra:
            result.update(extra)
    if make_plots and primary and spec.loss_curve and result["tr_losses"] \
            and not isinstance(result["tr_losses"], dict):
        from probunet_tpu.viz import plot_loss_curves
        plot_loss_curves(result["tr_losses"], result["val_losses"],
                         os.path.join(cfg.plotdir, spec.loss_curve))
    logger.close()
    return result

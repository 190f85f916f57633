"""Batch inference / serving: checkpoint -> downscaled ensemble netCDF.

The production counterpart the reference lacks entirely (its only outputs are
matplotlib PNGs): load a trained checkpoint, stream the requested years
through the vmapped ensemble sampler data-parallel over the local device
mesh, and write physical-unit HR ensembles back out as netCDF-4 — one dataset
per variable shaped (time, member, rlat, rlon) — ready for downstream climate
tooling. Writes stream chunk-by-chunk (StreamingFieldWriter) overlapped with
the next batch's device compute, so host memory stays O(batch) even for
century-scale ensembles. Single-process (multi-host serving would need a
cross-process writer); all local chips are used.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.data.dataset import ClimexDataset
from probunet_tpu.data.netcdf import StreamingFieldWriter
from probunet_tpu.train import make_sample_fn
from probunet_tpu.train.checkpoint import restore_checkpoint
from probunet_tpu.train.loop import abstract_probunet_state, build_probunet
from probunet_tpu.train.state import make_optimizer
from probunet_tpu.utils.logging import progress


def downscale(
    cfg: Config,
    checkpoint_dir: str,
    out_path: str,
    years: Optional[Sequence[int]] = None,
    num_samples: Optional[int] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
    dataset: Optional[ClimexDataset] = None,
) -> str:
    """Run ensemble downscaling over a year range and write netCDF output.

    Returns the written path. Output per variable: (T, K, H, W) physical-unit
    HR fields (the residual->HR inverse applied on device)."""
    years = list(years if years is not None else cfg.years("test"))
    num_samples = num_samples or cfg.num_samples
    batch_size = batch_size or cfg.batch_size

    ds = dataset or ClimexDataset(
        cfg.datadir, years=years, variables=cfg.variables, coords=cfg.coords,
        lowres_scale=cfg.lowres_scale, standardization=cfg.standardization)

    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.accum, cfg.optimizer,
                        state_dtype=cfg.opt_state_dtype)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.ds_model == "edm":
        # diffusion downscaler: Heun ensemble sampler, same output contract
        from probunet_tpu.train import make_edm_sample_fn
        from probunet_tpu.train.loop import abstract_edm_state, build_edm_model
        model = build_edm_model(cfg)
        template = abstract_edm_state(cfg, model, tx)
        sample_fn = make_edm_sample_fn(model, cfg.lowres_scale, cfg.standardization,
                                       num_samples, cfg.edm_steps,
                                       compute_dtype=dtype)
    else:
        model = build_probunet(cfg)
        # Abstract (eval_shape) restore template: no real init on the serving path.
        template = abstract_probunet_state(cfg, model, tx)
        sample_fn = make_sample_fn(model, cfg.lowres_scale, cfg.standardization,
                                   num_samples, dtype)
    state = restore_checkpoint(checkpoint_dir, template)

    # Sampling runs data-parallel over the whole local mesh (params
    # replicated, dataset tensor time-sharded, per-batch indices sharded when
    # divisible) — the same residency policy as the training loops.
    from probunet_tpu.parallel import make_mesh, put_batch, put_replicated
    mesh = make_mesh((-1,), ("data",))
    nd = mesh.devices.size
    params = put_replicated(state.params, mesh)
    hr_np = ds.hr_np
    hr_all = (put_batch(ds.hr_device(), mesh)
              if nd > 1 and hr_np.shape[0] % nd == 0
              else put_replicated(ds.hr_device(), mesh))
    stats = put_replicated(ds.stats, mesh)
    def put_idx(idx):
        return (put_batch(idx, mesh) if idx.shape[-1] % nd == 0
                else put_replicated(idx, mesh))
    rng = jax.random.key(seed)

    batches = ds.epoch_indices(0, batch_size, shuffle=False, drop_remainder=False)
    n, h, w = len(ds), hr_np.shape[1], hr_np.shape[2]
    shapes = {var: (n, num_samples, h, w) for var in cfg.variables}
    # Chunked streaming writes: each batch's (b, K, H, W, C) ensemble is
    # fetched and appended while the NEXT batch computes on device (the
    # one-deep pipeline below), so host memory stays O(batch), not O(T).
    with StreamingFieldWriter(out_path, shapes, ds.timestamps_np,
                              lat=ds.lat, lon=ds.lon,
                              attrs={"source": "probunet_tpu ensemble downscaling",
                                     "members": str(num_samples)}) as writer:
        pending = None  # (t0, rows_to_keep, device_preds)
        for bi in progress(range(batches.shape[0]), desc="Downscaling"):
            idx = put_idx(jnp.asarray(batches[bi]))
            preds, _ = sample_fn(params, hr_all, stats, idx,
                                 jax.random.fold_in(rng, bi))  # async dispatch
            if pending is not None:
                _write_chunk(writer, cfg.variables, *pending)
            pending = (bi * batch_size, min(batch_size, n - bi * batch_size), preds)
        if pending is not None:
            _write_chunk(writer, cfg.variables, *pending)
    return out_path


def _write_chunk(writer: StreamingFieldWriter, variables, t0: int, take: int,
                 preds) -> None:
    """Host-fetch one batch's (b, K, H, W, C) ensemble (de-padding the tail)
    and append it per variable."""
    arr = np.asarray(preds, dtype=np.float32)[:take]
    writer.append({var: arr[..., i] for i, var in enumerate(variables)}, t0)

"""Batch inference / serving: checkpoint -> downscaled ensemble netCDF.

The production counterpart the reference lacks entirely (its only outputs are
matplotlib PNGs): load a trained checkpoint, stream the requested years
through the vmapped ensemble sampler, and write physical-unit HR ensembles
back out as netCDF-4 — one dataset per variable shaped
(time, member, rlat, rlon) — ready for downstream climate tooling.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.config import Config
from probunet_tpu.data.dataset import ClimexDataset
from probunet_tpu.data.netcdf import write_fields
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
    params = jax.device_put(state.params, jax.devices()[0])
    hr_all = ds.hr_device()
    stats = ds.stats
    rng = jax.random.key(seed)

    batches = ds.epoch_indices(0, batch_size, shuffle=False, drop_remainder=False)
    n = len(ds)
    chunks = []
    for bi in progress(range(batches.shape[0]), desc="Downscaling"):
        idx = jnp.asarray(batches[bi])
        preds, _ = sample_fn(params, hr_all, stats, idx, jax.random.fold_in(rng, bi))
        chunks.append(np.asarray(preds, dtype=np.float32))
    ens = np.concatenate(chunks, axis=0)[:n]      # (T, K, H, W, C), de-padded

    fields: Dict[str, np.ndarray] = {
        var: ens[..., i] for i, var in enumerate(cfg.variables)
    }
    return write_fields(out_path, fields, ds.timestamps_np, ds.lat, ds.lon,
                        attrs={"source": "probunet_tpu ensemble downscaling",
                               "members": str(num_samples)})

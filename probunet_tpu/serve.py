"""Batch inference / serving: checkpoint -> downscaled ensemble netCDF.

The production counterpart the reference lacks entirely (its only outputs are
matplotlib PNGs): load a trained checkpoint, stream the requested years
through the vmapped ensemble sampler data-parallel over the local device
mesh, and write physical-unit HR ensembles back out as netCDF-4 — one dataset
per variable shaped (time, member, rlat, rlon) — ready for downstream climate
tooling. Writes stream chunk-by-chunk (StreamingFieldWriter) overlapped with
the next batch's device compute, so host memory stays O(batch) even for
century-scale ensembles.

Multi-process (``jax.distributed``): the global batch list is partitioned
into contiguous ranges, one per process; each process runs its range on its
OWN local-device mesh (no cross-process collectives in the sampling path —
ensemble generation is embarrassingly parallel over time) and streams its
time slice to a part file; the primary then merges the parts into the final
file (chunked copy, still O(chunk) host memory). Every process evaluates the
same dataset/statistics and folds the sampling RNG on the GLOBAL batch
index, so the merged output is byte-identical to a single-process run of the
same checkpoint (tests/test_multihost_e2e.py). Compute — the expensive side
of K-member ensemble sampling — scales linearly with processes; ingest is
replicated (each process reads the year range once).

The part-file merge requires ``out_path``'s directory to be on a filesystem
shared by all processes (NFS/GCS-fuse on a pod slice); on per-host local
disks the primary fails fast with a message saying so — point ``out_path``
at shared storage, or run one ``downscale`` per host over disjoint year
ranges instead.
"""

from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=8)
def _cached_probunet_sample_fn(model, lowres_scale, standardization,
                               num_samples, dtype):
    """One jitted sampler per (model, schedule) across downscale() calls.
    A fresh jax.jit instance per call would re-trace AND re-enter the
    fresh-executable slow window (~10x for its first ~50 batches, NOTES.md
    #2) on every serving request — measured 635 vs 55 ms/batch at 128x128
    K=16. Same idiom as steps._edm_sample_jitted."""
    return make_sample_fn(model, lowres_scale, standardization, num_samples,
                          dtype)


@functools.lru_cache(maxsize=8)
def _cached_edm_sample_fn(model, lowres_scale, standardization, num_samples,
                          num_steps, dtype):
    """EDM counterpart of :func:`_cached_probunet_sample_fn`."""
    from probunet_tpu.train import make_edm_sample_fn

    return make_edm_sample_fn(model, lowres_scale, standardization,
                              num_samples, num_steps, compute_dtype=dtype)


def _batch_range(nb: int, pi: int, pc: int):
    """Contiguous [lo, hi) batch-index range owned by process ``pi`` — THE
    partition rule is :func:`multihost.shard_years` (one implementation, so
    the byte-identical single-vs-multi-process guarantee can't drift). With
    more processes than batches, trailing processes get an empty range (they
    still participate in the merge barriers)."""
    from probunet_tpu.parallel.multihost import shard_years

    lo = sum(len(shard_years(range(nb), p, pc)) for p in range(pi))
    return lo, lo + len(shard_years(range(nb), pi, pc))


def downscale(
    cfg: Config,
    checkpoint_dir: str,
    out_path: str,
    years: Optional[Sequence[int]] = None,
    num_samples: Optional[int] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
    dataset: Optional[ClimexDataset] = None,
    compression: str = "gzip",
    batch_seconds: Optional[list] = None,
    pack_ranges: Optional[dict] = None,
) -> str:
    """Run ensemble downscaling over a year range and write netCDF output.

    Returns the written path. Output per variable: (T, K, H, W) physical-unit
    HR fields (the residual->HR inverse applied on device).

    ``compression``: 'gzip' (netCDF-standard, max interop) makes the pipeline
    WRITE-bound on a single host core; 'none'/'lzf' leave it bound by the
    device->host ensemble fetch (BASELINE_MEASURED.md has the decomposition).
    ``batch_seconds``: optional list; appends each loop iteration's wall time
    (dispatch of batch i + overlapped write of batch i-1) — the measurement
    hook scripts/serve_throughput.py uses for steady-state rates.

    ``pack_ranges``: optional {var: (lo, hi)} covering EVERY output variable
    — CF-standard int16 packing (scale_factor/add_offset; values outside the
    range clip; quantization step (hi-lo)/65534). The pack runs ON DEVICE so
    the per-batch ensemble crosses the device->host link as int16, HALVING
    the transfer that bounds this pipeline (BASELINE_MEASURED.md), and the
    archive stores 2 bytes/value. Readers (incl. NetCDFFile.read_var)
    un-pack transparently via the CF attributes."""
    from probunet_tpu.parallel.multihost import allgather_counts, process_info

    pi, pc = process_info()
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
        from probunet_tpu.train.loop import abstract_edm_state, build_edm_model
        model = build_edm_model(cfg)
        template = abstract_edm_state(cfg, model, tx)
        sample_fn = _cached_edm_sample_fn(model, cfg.lowres_scale,
                                          cfg.standardization, num_samples,
                                          cfg.edm_steps, dtype)
    else:
        model = build_probunet(cfg)
        # Abstract (eval_shape) restore template: no real init on the serving path.
        template = abstract_probunet_state(cfg, model, tx)
        sample_fn = _cached_probunet_sample_fn(model, cfg.lowres_scale,
                                               cfg.standardization,
                                               num_samples, dtype)
    state = restore_checkpoint(checkpoint_dir, template)

    # Sampling runs data-parallel over this process's LOCAL mesh (params
    # replicated, dataset tensor time-sharded, per-batch indices sharded when
    # divisible) — no cross-process collectives: each process owns a disjoint
    # time range, so multi-process scaling is pure fan-out.
    from probunet_tpu.parallel import make_mesh, put_batch, put_replicated
    mesh = make_mesh((-1,), ("data",), devices=jax.local_devices())
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

    pack_fn = None
    if pack_ranges is not None:
        from probunet_tpu.data.netcdf import pack_params
        missing = [v for v in cfg.variables if v not in pack_ranges]
        if missing:
            raise ValueError(f"pack_ranges must cover every output variable; "
                             f"missing {missing}")
        scales, offsets = zip(*(pack_params(*pack_ranges[v])
                                for v in cfg.variables))
        sc = jnp.asarray(scales, jnp.float32)
        off = jnp.asarray(offsets, jnp.float32)

        @jax.jit
        def pack_fn(preds):  # (..., C) float -> CF int16, clipped
            q = jnp.round((preds.astype(jnp.float32) - off) / sc)
            return jnp.clip(q, -32767, 32767).astype(jnp.int16)

    batches = ds.epoch_indices(0, batch_size, shuffle=False, drop_remainder=False)
    nb = batches.shape[0]
    lo_b, hi_b = _batch_range(nb, pi, pc)
    n, h, w = len(ds), hr_np.shape[1], hr_np.shape[2]
    # clamp BOTH bounds: a process whose range is empty (pc > nb) or whose
    # range starts past the ragged tail owns zero rows — it writes an empty
    # part and still joins the merge barriers
    t_lo = min(lo_b * batch_size, n)
    t_hi = min(hi_b * batch_size, n)
    my_path = out_path if pc == 1 else f"{out_path}.part{pi}"
    attrs = {"source": "probunet_tpu ensemble downscaling",
             "members": str(num_samples)}
    shapes = {var: (t_hi - t_lo, num_samples, h, w) for var in cfg.variables}
    # Chunked streaming writes: each batch's (b, K, H, W, C) ensemble is
    # fetched and appended while the NEXT batch computes on device (the
    # one-deep pipeline below), so host memory stays O(batch), not O(T).
    with StreamingFieldWriter(my_path, shapes, ds.timestamps_np[t_lo:t_hi],
                              lat=ds.lat, lon=ds.lon, attrs=attrs,
                              compression=compression,
                              packing=pack_ranges) as writer:
        import time as _time
        pending = None  # (t0, rows_to_keep, device_preds)
        last_t = _time.perf_counter()
        for bi in progress(range(lo_b, hi_b), desc="Downscaling"):
            idx = put_idx(jnp.asarray(batches[bi]))
            # RNG folds on the GLOBAL batch index, so the multi-process
            # output equals the single-process run draw-for-draw
            preds, _ = sample_fn(params, hr_all, stats, idx,
                                 jax.random.fold_in(rng, bi))  # async dispatch
            if pack_fn is not None:
                preds = pack_fn(preds)  # int16 crosses the host link, not f32
            if pending is not None:
                _write_chunk(writer, cfg.variables, *pending)
            pending = (bi * batch_size - t_lo,
                       min(batch_size, n - bi * batch_size), preds)
            if batch_seconds is not None:
                now = _time.perf_counter()
                batch_seconds.append(now - last_t)
                last_t = now
        if pending is not None:
            _write_chunk(writer, cfg.variables, *pending)

    if pc > 1:
        allgather_counts(1)  # barrier: every part file is closed
        if pi == 0:
            part_offsets = [(_batch_range(nb, p, pc)[0] * batch_size,
                             f"{out_path}.part{p}") for p in range(pc)]
            _merge_parts(out_path, part_offsets, cfg.variables,
                         {var: (n, num_samples, h, w) for var in cfg.variables},
                         ds.timestamps_np, ds.lat, ds.lon, attrs, compression,
                         packing=pack_ranges)
        allgather_counts(2)  # barrier: merged file visible before any return
        if pi == 0:
            for _, part in part_offsets:
                os.remove(part)
    return out_path


def _merge_parts(out_path, part_offsets, variables, shapes, timestamps,
                 lat, lon, attrs, compression: str = "gzip",
                 packing: Optional[dict] = None, chunk: int = 64) -> None:
    """Primary-process merge: stream every part's per-variable datasets into
    the final full-range file, chunk by chunk (host memory stays O(chunk)).
    Packed variables move as raw int16 (h5py reads skip the CF un-pack)."""
    import h5py

    missing = [part for _, part in part_offsets if not os.path.exists(part)]
    if missing:
        raise RuntimeError(
            f"part files not visible to the primary: {missing} — "
            "multi-process serving needs out_path on a filesystem shared by "
            "all processes (each writes its own part there); on per-host "
            "local disks run one downscale per host over disjoint year "
            "ranges instead")
    with StreamingFieldWriter(out_path, shapes, timestamps, lat=lat, lon=lon,
                              attrs=attrs, compression=compression,
                              packing=packing) as writer:
        for t0, part in part_offsets:
            with h5py.File(part, "r") as f:
                nt = f[variables[0]].shape[0] if variables else 0
                for lo in range(0, nt, chunk):
                    fields = {var: f[var][lo:lo + chunk] for var in variables}
                    writer.append(fields, t0 + lo)


def _write_chunk(writer: StreamingFieldWriter, variables, t0: int, take: int,
                 preds) -> None:
    """Host-fetch one batch's (b, K, H, W, C) ensemble (de-padding the tail)
    and append it per variable. The dtype passes through: float32 normally,
    int16 when the ensemble was CF-packed on device."""
    arr = np.asarray(preds)[:take]
    if arr.dtype != np.int16:
        arr = arr.astype(np.float32, copy=False)
    writer.append({var: arr[..., i] for i, var in enumerate(variables)}, t0)

"""Multi-host (multi-process) scaffolding: jax.distributed + per-host data.

The reference's scaling story for ingest is a dask cluster
(climex_utils.py:86, main.py:12); the TPU-native equivalent (SURVEY.md §2.5)
is one JAX process per host, ``jax.distributed.initialize`` wiring them into
a single global mesh, and **per-host file sharding**: each process reads only
its contiguous slice of the year range, feeds its local slice of every global
batch, and XLA's gradient all-reduce does the rest.

Everything here degrades to a no-op on a single process, so the same training
code runs unchanged from one chip to a pod:

- :func:`maybe_initialize_distributed` — env-gated ``jax.distributed.initialize``;
- :func:`shard_years` — balanced contiguous partition of the year list;
- :func:`local_batch_slice` — this process's rows of a global batch;
- :func:`make_global_batch` — assemble a globally-sharded device array from
  process-local host data (``jax.make_array_from_process_local_data``);
- :func:`allreduce_moments` / :func:`merge_moment_stats` /
  :func:`global_perpixel_stats` — GLOBAL standardization statistics when
  ingest is year-sharded;
- :func:`allgather_counts` + :func:`stratified_epoch_batches` — lockstep
  epoch batch plans (same nb on every process, each global batch assembled
  from exactly batch/num_shards rows per shard).

All of this is LIVE in the production loops (train.loop builds a
:class:`MultihostPlan` whenever ``process_count > 1`` or
``--data_shards > 1``); correctness is proven by tests/test_multihost.py
(pure math) and tests/test_multihost_e2e.py (a REAL 2-process
``jax.distributed`` run on the CPU backend whose per-step losses equal the
single-process run of the same batch plan).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

_initialized = False


def maybe_initialize_distributed(force: bool = False) -> bool:
    """Call ``jax.distributed.initialize()`` when a multi-host launch is
    detected (coordinator env vars set, or ``force=True``). Must run before
    any JAX backend touch. Returns True when running multi-process.

    Detection: any of COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS /
    PROBUNET_MULTIHOST=1 (TPU pod slices auto-detect args, so initialize()
    needs no explicit addresses there). For generic (non-TPU-pod) launches,
    PROBUNET_NUM_PROCESSES + PROBUNET_PROCESS_ID select the explicit-args
    form — this is how the 2-process CPU-backend parity test
    (tests/test_multihost_e2e.py) brings the cluster up.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    coord = (os.environ.get("COORDINATOR_ADDRESS")
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    nproc = os.environ.get("PROBUNET_NUM_PROCESSES")
    # nproc participates in activation so a misconfigured explicit-args launch
    # (PROBUNET_NUM_PROCESSES set, coordinator missing) fails fast below
    # instead of silently running single-process.
    if not (force or coord or nproc or os.environ.get("PROBUNET_MULTIHOST")):
        return False
    if nproc is not None:
        pid = os.environ.get("PROBUNET_PROCESS_ID")
        missing = [n for n, v in (("COORDINATOR_ADDRESS", coord),
                                  ("PROBUNET_PROCESS_ID", pid)) if not v]
        if missing:
            raise ValueError(
                "PROBUNET_NUM_PROCESSES is set but " + "/".join(missing) +
                " is not; explicit-args multi-host launch needs "
                "COORDINATOR_ADDRESS, PROBUNET_NUM_PROCESSES and "
                "PROBUNET_PROCESS_ID")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid))
    else:
        jax.distributed.initialize()
    _initialized = True
    return jax.process_count() > 1


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) on a single host."""
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # backend not initialized yet
        return 0, 1


def shard_years(years: Sequence[int], process_index: int,
                process_count: int) -> List[int]:
    """Balanced contiguous partition of ``years`` across processes.

    Every year is assigned to exactly one process; sizes differ by at most 1
    (the first ``len(years) % process_count`` processes get the extra year).
    Deterministic in the input order.
    """
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in [0, {process_count})")
    years = list(years)
    n = len(years)
    base, rem = divmod(n, process_count)
    start = process_index * base + min(process_index, rem)
    size = base + (1 if process_index < rem else 0)
    return years[start:start + size]


def local_batch_slice(global_batch_size: int, process_index: int,
                      process_count: int) -> slice:
    """Rows of a global batch owned by this process (contiguous blocks, the
    layout ``jax.make_array_from_process_local_data`` expects for a
    batch-sharded leading axis)."""
    if global_batch_size % process_count:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {process_count} processes")
    per = global_batch_size // process_count
    return slice(process_index * per, (process_index + 1) * per)


def merge_moment_stats(parts):
    """Merge per-process (sum, sum_of_squares, count) accumulators into a
    global (mean, unbiased_std) — the mergeable-moments identity that keeps
    per-host year sharding numerically identical to a single-host pass over
    the full train range (stats must be GLOBAL even when ingest is sharded).

    parts: iterable of (s1, s2, n) with s1/s2 float64 arrays and n scalar.
    """
    s1 = sum(np.asarray(p[0], np.float64) for p in parts)
    s2 = sum(np.asarray(p[1], np.float64) for p in parts)
    n = sum(int(p[2]) for p in parts)
    mean = s1 / n
    var = (s2 - n * mean * mean) / (n - 1)
    return mean.astype(np.float32), np.sqrt(np.maximum(var, 0.0)).astype(np.float32)


def _allgather_f64_rows(row: np.ndarray) -> np.ndarray:
    """Bit-exact all-gather of each process's float64 row vector.

    The device transport is the only cross-process channel multi-host JAX
    guarantees, but with ``jax_enable_x64`` unset a float64 device array is
    silently canonicalized to float32 — which would destroy exactly the
    precision the streaming-stats path exists to preserve
    (data/pipeline.py::lr_moments_streaming: the ``s2 - n*mean²`` subtraction
    on Kelvin-scale century sums cancels catastrophically in f32). So we
    transport BITS, not values: the float64 payload is reinterpreted as
    uint32 words, gathered replicated, and reinterpreted back to float64 on
    the host. Returns the (process_count, k) float64 matrix of every
    process's row; any reduction then happens on host in real float64."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    row = np.ascontiguousarray(np.asarray(row, np.float64).ravel())
    words = row.view(np.uint32)[None]  # (1, 2k) word pairs — uint32 survives x64-off canonicalization
    devs = np.array(jax.devices()).reshape(jax.process_count(), -1)
    mesh = Mesh(devs, ("proc", "dev"))
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("proc")), words)
    full = np.asarray(jax.jit(lambda a: a + jnp.zeros((), a.dtype),
                              out_shardings=NamedSharding(mesh, P()))(garr))
    assert full.dtype == np.uint32, full.dtype
    return np.ascontiguousarray(full).view(np.float64)


def allreduce_sum(*arrays):
    """Element-wise float64 sum of host arrays across processes. The device
    transport carries the raw float64 bits (see :func:`_allgather_f64_rows`);
    the sum itself runs on host in float64, in process order, so the result
    is deterministic and numerically identical on every process.
    Single-process: identity. Arrays may have any shapes; they are packed
    into one payload."""
    import jax

    if jax.process_count() == 1:
        return arrays
    shapes = [np.asarray(a).shape for a in arrays]
    payload = np.concatenate(
        [np.asarray(a, np.float64).ravel() for a in arrays])
    rows = _allgather_f64_rows(payload)  # (pc, k) float64, bit-exact
    total = rows.sum(axis=0, dtype=np.float64)
    out, lo = [], 0
    for shp in shapes:
        n = int(np.prod(shp)) if shp else 1
        out.append(total[lo:lo + n].reshape(shp))
        lo += n
    return tuple(out)


def allreduce_moments(s1: np.ndarray, s2: np.ndarray, count: int):
    """Sum (s1, s2, count) across processes (see :func:`allreduce_sum`).
    Returns the summed (s1, s2, count) on every process."""
    import jax

    if jax.process_count() == 1:
        return s1, s2, count
    s1, s2, cnt = allreduce_sum(s1, s2, np.float64(count))
    return s1, s2, int(round(float(cnt)))


def make_global_batch(local_np: np.ndarray, sharding):
    """Assemble the global batch-sharded device array from this process's
    local rows. Single-process: a plain device_put (local == global)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    return jax.make_array_from_process_local_data(sharding, local_np)


def allgather_counts(local_n: int):
    """All processes' ``local_n`` values, ordered by process index, visible on
    every process (bit-exact float64 device transport — exact for any count
    below 2**53, not f32's 2**24). Single-process: ``[local_n]``."""
    import jax

    if jax.process_count() == 1:
        return np.asarray([int(local_n)], np.int64)
    rows = _allgather_f64_rows(np.asarray([np.float64(local_n)]))
    return np.asarray(np.round(rows[:, 0]), np.int64)


def global_perpixel_stats(hr_np: np.ndarray, lowres_scale: int):
    """Per-pixel standardization statistics over the GLOBAL (all-process)
    train split: local float64 LR moments -> cross-process all-reduce ->
    (mean, std) repeated to the HR grid. Numerically identical to a
    single-host pass over the full year range (mergeable-moments identity;
    see tests/test_multihost.py). Single-process: equals the streaming local
    stats."""
    from probunet_tpu.data.pipeline import lr_moments_streaming

    s1, s2, n = lr_moments_streaming(hr_np, lowres_scale)
    s1, s2, n = allreduce_moments(s1, s2, n)
    mean, std = merge_moment_stats([(s1, s2, n)])
    mean_hr = np.repeat(np.repeat(mean, lowres_scale, axis=0), lowres_scale, axis=1)
    std_hr = np.repeat(np.repeat(std, lowres_scale, axis=0), lowres_scale, axis=1)
    return mean_hr, std_hr


def stratified_epoch_batches(shard_sizes: Sequence[int], batch: int, seed: int,
                             shuffle: bool = True) -> np.ndarray:
    """Lockstep epoch batch plan over year-sharded data: an (nb, batch) array
    of GLOBAL sample indices where every batch takes exactly
    ``batch // num_shards`` rows from each contiguous shard, rows grouped in
    shard order (the layout ``make_global_batch`` needs: process p's rows are
    the contiguous block ``local_batch_slice(batch, p, num_shards)``).

    Deterministic in (shard_sizes, batch, seed) only — every process computes
    the identical plan with no communication. Each shard's samples are
    shuffled with an independent per-shard stream; nb = min over shards, so
    uneven shards stay in lockstep (the tail of larger shards is dropped,
    like drop_remainder)."""
    shard_sizes = [int(s) for s in shard_sizes]
    k = len(shard_sizes)
    if batch % k:
        raise ValueError(f"batch {batch} not divisible by {k} shards")
    per = batch // k
    nb = min(s // per for s in shard_sizes)
    if nb == 0:
        raise ValueError(f"some shard ({shard_sizes}) has fewer than {per} samples")
    cols = []
    offset = 0
    for p, size in enumerate(shard_sizes):
        order = (np.random.default_rng([seed, p]).permutation(size) if shuffle
                 else np.arange(size))
        cols.append(offset + order[: nb * per].reshape(nb, per))
        offset += size
    return np.concatenate(cols, axis=1)


class MultihostPlan:
    """Per-step global-batch assembly keeping every process in lockstep.

    Built by the training loops whenever ``jax.process_count() > 1`` (real
    multi-host: each process ingested only its :func:`shard_years` slice of
    the train years) or when ``--data_shards > 1`` on a single process (the
    parity-test configuration: one process holding ALL years reproduces the
    multi-process batch plan bit-for-bit, so a 2-process run can be asserted
    equal to a single-process run — tests/test_multihost_e2e.py).

    Responsibilities:
    - lockstep epoch plans (:func:`stratified_epoch_batches` from allgathered
      shard sizes — same nb and same global sample ids on every process);
    - GLOBAL perpixel standardization stats (:func:`global_perpixel_stats`,
      fixing the per-host-local-stats bug class);
    - assembling each step's global device arrays from process-local rows
      (:func:`make_global_batch`).
    """

    def __init__(self, cfg, ds_train, mesh):
        import jax
        from probunet_tpu.parallel.mesh import batch_sharding, replicated

        self.cfg = cfg
        self.mesh = mesh
        self.pi, self.pc = process_info()
        self.num_shards = int(cfg.data_shards) or self.pc
        if self.pc > 1 and self.num_shards != self.pc:
            raise ValueError(
                f"data_shards={self.num_shards} must equal process_count={self.pc} "
                "when running multi-process")
        if cfg.batch_size % self.num_shards:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                             f"{self.num_shards} shards")
        if self.pc > 1:
            self.shard_sizes = [int(s) for s in allgather_counts(len(ds_train))]
            self.offset = int(sum(self.shard_sizes[:self.pi]))
        else:
            # single-process simulation: this process holds every shard, so
            # global ids ARE local ids (offset 0); sizes follow the year split
            self.shard_sizes = shard_sizes_for(len(ds_train), ds_train.years,
                                               self.num_shards)
            self.offset = 0
        self.global_train_n = int(sum(self.shard_sizes))
        self.replicated = replicated(mesh)
        # Batch rows shard over the mesh's "data" axis when it exists (2D
        # data x spatial meshes shard H over the other axis), else over the
        # whole (1D DP) mesh.
        data_size = (mesh.shape["data"] if "data" in mesh.axis_names
                     else mesh.devices.size)
        if cfg.batch_size % data_size == 0:
            self.batch_sharding = batch_sharding(
                mesh, "data" if "data" in mesh.axis_names else mesh.axis_names[0])
        elif self.pc == 1:
            # same fallback as the DP loop's put_idx: replicate small batches
            self.batch_sharding = self.replicated
        else:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"{data_size}-way data axis for multi-process batch sharding")
        # GLOBAL train-split standardization stats (host numpy)
        self.stats_np = self.split_stats(ds_train, merged=True)
        # device-replicated global-stats tuples, cached per stats object so
        # val/test stats upload once instead of once per eval/CRPS batch
        self._repl_cache = {}
        # cached batch-sharded global arange (per-step gather indices)
        b = cfg.batch_size
        rows = local_batch_slice(b, self.pi, self.pc)
        self._arange = make_global_batch(np.arange(b, dtype=np.int32)[rows],
                                         self.batch_sharding)

    # ---- statistics ----
    def split_stats(self, ds, merged: bool = False):
        """Host-numpy standardization stats for a split. ``merged=True``
        all-reduces perpixel moments across processes (train split, where
        ingest is year-sharded); replicated splits (val/test) use local-only
        stats, identical on every process."""
        from probunet_tpu.data.pipeline import compute_lr_stats_streaming

        std = self.cfg.standardization
        if std == "none":
            return None
        if std == "perpixel" and merged:
            return global_perpixel_stats(ds.hr_np, self.cfg.lowres_scale)
        return compute_lr_stats_streaming(ds.hr_np, self.cfg.lowres_scale, std)

    # ---- epoch plans ----
    @property
    def steps_per_epoch(self) -> int:
        per = self.cfg.batch_size // self.num_shards
        return min(s // per for s in self.shard_sizes)

    def epoch_batches(self, epoch_seed: int, shuffle: bool = True) -> np.ndarray:
        """(nb, batch_size) GLOBAL train sample ids, identical on every
        process; rows grouped per shard."""
        return stratified_epoch_batches(self.shard_sizes, self.cfg.batch_size,
                                        epoch_seed, shuffle=shuffle)

    def replicated_batches(self, n: int, batch: Optional[int] = None) -> np.ndarray:
        """Sequential (nb, batch) ids over a REPLICATED split (val/test) —
        eval order matches the single-host loop's shuffle=False epoch."""
        batch = batch or self.cfg.batch_size
        nb = n // batch
        return np.arange(nb * batch, dtype=np.int64).reshape(nb, batch)

    # ---- per-step assembly ----
    def device_batch(self, hr_np: np.ndarray, batch_gids: np.ndarray,
                     stats_np=None, timestamps_np: Optional[np.ndarray] = None,
                     replicated_source: bool = False) -> dict:
        """Assemble one step's global device arrays from this process's rows.

        ``replicated_source=True`` means every process holds the full split
        (val/test), so global ids index the local copy directly. Returns
        {hr, stats, idx[, timestamps]} matching the fused step signatures
        (hr is the (B, H, W, C) batch, idx the batch-sharded arange)."""
        b = len(batch_gids)
        rows = local_batch_slice(b, self.pi, self.pc)
        lids = np.asarray(batch_gids)[rows]
        if not replicated_source:
            lids = lids - self.offset
        item = {"hr": make_global_batch(np.ascontiguousarray(hr_np[lids]),
                                        self.batch_sharding)}
        std = self.cfg.standardization
        if stats_np is None:
            item["stats"] = None
        elif std in ("pertimestep", "minmax"):
            item["stats"] = tuple(
                make_global_batch(np.ascontiguousarray(s[lids]), self.batch_sharding)
                for s in stats_np)
        else:
            # cache holds the key object itself so a GC'd tuple can never
            # alias a new one through CPython id() reuse
            key = id(stats_np)
            hit = self._repl_cache.get(key)
            if hit is None or hit[0] is not stats_np:
                self._repl_cache[key] = (stats_np, tuple(
                    make_global_batch(np.asarray(s, np.float32), self.replicated)
                    for s in stats_np))
            item["stats"] = self._repl_cache[key][1]
        if timestamps_np is not None:
            item["timestamps"] = make_global_batch(
                np.ascontiguousarray(timestamps_np[lids]), self.batch_sharding)
        item["idx"] = self._arange if b == self.cfg.batch_size else \
            make_global_batch(np.arange(b, dtype=np.int32)[rows], self.batch_sharding)
        return item

    def batch_iter(self, hr_np: np.ndarray, batches: np.ndarray, stats_np=None,
                   timestamps_np: Optional[np.ndarray] = None,
                   replicated_source: bool = False,
                   buffer_size: Optional[int] = None):
        """Background-thread assembly of the epoch's global batches: item
        k+1's host slicing + global-array assembly overlaps the device
        compute of item k (the plan-mode counterpart of the streaming path's
        DevicePrefetcher double buffering). Depth defaults to
        ``cfg.prefetch_buffer`` (assemble N-1 steps ahead)."""
        from probunet_tpu.data.pipeline import ThreadPrefetcher

        if buffer_size is None:
            buffer_size = int(getattr(self.cfg, "prefetch_buffer", 2) or 2)

        def gen():
            for bi in range(batches.shape[0]):
                yield self.device_batch(hr_np, batches[bi], stats_np,
                                        timestamps_np=timestamps_np,
                                        replicated_source=replicated_source)

        return iter(ThreadPrefetcher(gen(), buffer_size=buffer_size))

    def put_state(self, state):
        """Replicate a locally-initialized train state as a global array tree
        (host round-trip: device_put of committed per-process arrays into a
        multi-process sharding is not allowed)."""
        import jax
        return jax.device_put(jax.device_get(state), self.replicated)

    @property
    def is_primary(self) -> bool:
        return self.pi == 0


def make_plan(cfg, ds_train, mesh) -> Optional[MultihostPlan]:
    """A :class:`MultihostPlan` when multi-process (or simulating shards via
    --data_shards), else None (the plain single-host fast path)."""
    _, pc = process_info()
    if pc > 1 or int(cfg.data_shards) > 1:
        return MultihostPlan(cfg, ds_train, mesh)
    return None


def require_single_process(what: str, cfg=None) -> None:
    """Fail FAST (before any expensive init) for drivers that have no
    multi-process path yet — running them under jax.distributed would either
    crash placing locally-committed arrays into a global mesh, or silently
    train on per-host-local standardization statistics."""
    _, pc = process_info()
    if pc > 1:
        raise NotImplementedError(
            f"{what} has no multi-process (jax.distributed) support yet; "
            "run it single-process, or use the data-parallel prob-U-Net / "
            "baseline loops which are multi-host capable")
    if cfg is not None and int(getattr(cfg, "data_shards", 0)) > 1:
        raise ValueError(f"--data_shards applies to the multi-host batch plan, "
                         f"which {what} does not use")


def shard_sizes_for(n_samples: int, years: Sequence[int], num_shards: int):
    """Per-shard sample counts for a dataset of ``n_samples`` covering
    ``years``, partitioned by :func:`shard_years`. Requires a uniform
    samples-per-year calendar (ClimEx is noleap: 365 days every year), which
    is asserted."""
    years = list(years)
    if n_samples % len(years):
        raise ValueError(
            f"{n_samples} samples over {len(years)} years is not uniform; "
            "cannot derive shard sizes")
    spy = n_samples // len(years)
    return [len(shard_years(years, p, num_shards)) * spy for p in range(num_shards)]

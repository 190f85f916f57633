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
from typing import List, Sequence

import numpy as np

_initialized = False


def maybe_initialize_distributed(force: bool = False) -> bool:
    """Call ``jax.distributed.initialize()`` when a multi-host launch is
    detected (coordinator env vars set, or ``force=True``). Must run before
    any JAX backend touch. Returns True when running multi-process.

    Detection: any of COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS /
    PROBUNET_MULTIHOST=1 (TPU pod slices auto-detect args, so initialize()
    needs no explicit addresses there).
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    coord = (os.environ.get("COORDINATOR_ADDRESS")
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not (force or coord or os.environ.get("PROBUNET_MULTIHOST")):
        return False
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


def allreduce_moments(s1: np.ndarray, s2: np.ndarray, count: int):
    """Sum (s1, s2, count) across processes through the devices (the only
    transport multi-host JAX guarantees): each process contributes one shard
    of a process-sharded global array; a jitted sum reduces it. Returns the
    summed (s1, s2, count) on every process. Single-process: identity."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return s1, s2, count
    # one (1, k) row per process; rows sharded over the 'proc' mesh axis
    payload = np.concatenate(
        [np.asarray(s1, np.float64).ravel(), np.asarray(s2, np.float64).ravel(),
         [np.float64(count)]])[None]
    devs = np.array(jax.devices()).reshape(jax.process_count(), -1)
    mesh = Mesh(devs, ("proc", "dev"))
    garr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("proc")), payload)
    total = np.asarray(jax.jit(lambda a: jnp.sum(a, axis=0),
                               out_shardings=NamedSharding(mesh, P()))(garr), np.float64)
    k = s1.size
    return (total[:k].reshape(s1.shape), total[k:2 * k].reshape(s2.shape),
            int(round(total[-1])))


def make_global_batch(local_np: np.ndarray, sharding):
    """Assemble the global batch-sharded device array from this process's
    local rows. Single-process: a plain device_put (local == global)."""
    import jax

    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    return jax.make_array_from_process_local_data(sharding, local_np)

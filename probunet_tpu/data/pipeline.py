"""Host->device streaming pipeline (the dask-replacement prefetch path).

The default training mode keeps the whole HR tensor in HBM (SURVEY.md: 100
years of 64x64x3 is ~1.8 GB). For full-domain or 256x256 multi-variable runs
that exceed HBM, this module streams batches: a background thread slices the
host array and ``jax.device_put``s the *next* batch while the device computes
the current one (double buffering), so the step never waits on PCIe/host.

Also provides streaming computation of the per-pixel standardization
statistics (one chunked device pass with sum/sum-of-squares accumulators), so
stats never require the full tensor on device either.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.ops.resample import avg_pool


class ThreadPrefetcher:
    """Drain any item-producing iterator in a background thread through a
    bounded queue, so producing item k+1 (host slicing, device_put, global-
    array assembly) overlaps the consumer's compute on item k. Items pass
    through ``transform`` (if given) inside the worker thread."""

    def __init__(self, it: Iterator, buffer_size: int = 2, transform=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._transform = transform
        self._thread = threading.Thread(target=self._worker, args=(it,), daemon=True)
        self._thread.start()

    def _worker(self, it):
        try:
            for item in it:
                self._q.put(self._transform(item) if self._transform else item)
        except Exception as e:  # surface worker errors to the consumer
            self._q.put(e)
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item


class DevicePrefetcher(ThreadPrefetcher):
    """Wrap a host iterator; keep ``buffer_size`` items device-put ahead.

    ``sharding`` is either one sharding applied to every leaf, or a dict
    keyed by the item's top-level keys (e.g. batch-sharded ``hr`` next to
    replicated global ``stats``) — so streamed batches land directly on the
    mesh layout the step compiled against, with no in-step reshard."""

    def __init__(self, host_iter: Iterator, buffer_size: int = 2, sharding=None):
        self._sharding = sharding
        super().__init__(host_iter, buffer_size, transform=self._put_item)

    def _put_item(self, item):
        if isinstance(self._sharding, dict) and isinstance(item, dict):
            out = {}
            for k, v in item.items():
                sh = self._sharding.get(k)
                put = (lambda a, sh=sh: jax.device_put(a, sh)) if sh is not None \
                    else jax.device_put
                out[k] = jax.tree.map(put, v)
            return out
        put = (lambda a: jax.device_put(a, self._sharding)) if self._sharding is not None \
            else jax.device_put
        return jax.tree.map(put, item)


def stream_batches(
    hr_np: np.ndarray,
    batch_size: int,
    epoch_seed: int,
    stats_np: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    standardization: str = "perpixel",
    shuffle: bool = True,
    buffer_size: int = 2,
    sharding=None,
    timestamps_np: Optional[np.ndarray] = None,
    replicated_sharding=None,
    start_batch: int = 0,
) -> Iterator[Dict]:
    """Yield device-resident {hr, stats[, timestamps]} batches, double-buffered.

    For pertimestep/minmax, per-sample stats slices ride along with the batch;
    for perpixel/none the global stats are passed through unsliced. Pass
    ``timestamps_np`` for models that condition on time (the deterministic
    baselines' class_labels path).

    On a multi-device mesh pass ``sharding`` (the batch sharding, applied to
    hr / per-sample stats / timestamps) and ``replicated_sharding`` (applied
    to global perpixel stats) so streamed arrays land on the step's layout
    directly instead of being resharded inside the XLA program.
    """
    if sharding is not None:
        if replicated_sharding is None and hasattr(sharding, "mesh"):
            # derive it: global (perpixel) stats must be REPLICATED on the
            # same mesh, never left on the default device next to a sharded hr
            from jax.sharding import NamedSharding, PartitionSpec
            replicated_sharding = NamedSharding(sharding.mesh, PartitionSpec())
        stats_sh = (sharding if standardization in ("pertimestep", "minmax")
                    else replicated_sharding)
        sharding = {"hr": sharding, "timestamps": sharding, "stats": stats_sh}
    n = hr_np.shape[0]
    order = (np.random.default_rng(epoch_seed).permutation(n) if shuffle
             else np.arange(n))
    nb = n // batch_size

    def host_iter():
        # start_batch: resume an interrupted epoch mid-way (identical order —
        # the permutation is a pure function of epoch_seed)
        for b in range(start_batch, nb):
            idx = order[b * batch_size:(b + 1) * batch_size]
            item = {"hr": hr_np[idx]}
            if stats_np is not None and standardization in ("pertimestep", "minmax"):
                item["stats"] = (stats_np[0][idx], stats_np[1][idx])
            elif stats_np is not None:
                item["stats"] = stats_np
            if timestamps_np is not None:
                item["timestamps"] = timestamps_np[idx]
            yield item

    return iter(DevicePrefetcher(host_iter(), buffer_size=buffer_size, sharding=sharding))


def lr_moments_streaming(hr_np: np.ndarray, lowres_scale: int, chunk: int = 512):
    """Raw per-pixel LR moments of a host-resident HR tensor: float64
    (sum, sum_of_squares, count) on the LR grid, accumulated chunk-by-chunk.

    Pooling runs on device; accumulation is float64 on host — fp32
    sum-of-squares of Kelvin-scale fields over a century loses ~all precision
    in the ``s2 - n*mean^2`` subtraction (jax_enable_x64 is never set here).
    These are the mergeable accumulators multi-host all-reduces for GLOBAL
    standardization stats (parallel.multihost.global_perpixel_stats)."""
    t = hr_np.shape[0]
    pool = jax.jit(lambda x: avg_pool(x, lowres_scale))
    s1 = s2 = None
    for lo in range(0, t, chunk):
        lr64 = np.asarray(pool(jnp.asarray(hr_np[lo:lo + chunk]))).astype(np.float64)
        c1 = lr64.sum(axis=0)
        c2 = (lr64 * lr64).sum(axis=0)
        s1 = c1 if s1 is None else s1 + c1
        s2 = c2 if s2 is None else s2 + c2
    return s1, s2, t


def compute_lr_stats_streaming(
    hr_np: np.ndarray,
    lowres_scale: int,
    standardization: str,
    chunk: int = 512,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Chunked-device equivalent of transforms.compute_lr_stats for host-
    resident datasets. Matches the non-streaming result (unbiased std)."""
    if standardization == "none":
        return None
    t = hr_np.shape[0]

    if standardization == "perpixel":
        s1, s2, n = lr_moments_streaming(hr_np, lowres_scale, chunk)
        mean = s1 / n
        # unbiased variance (torch std default, climex_utils.py:174)
        var = (s2 - n * mean * mean) / (n - 1)
        std = np.sqrt(np.maximum(var, 0.0)).astype(np.float32)
        mean = mean.astype(np.float32)
        s = lowres_scale
        mean_hr = np.repeat(np.repeat(mean, s, axis=0), s, axis=1)
        std_hr = np.repeat(np.repeat(std, s, axis=0), s, axis=1)
        return mean_hr, std_hr

    # per-sample modes reduce within each sample — chunked trivially
    parts0, parts1 = [], []
    fn = jax.jit(lambda x: transforms.compute_lr_stats(x, lowres_scale, standardization),
                 static_argnames=())
    for lo in range(0, t, chunk):
        a, b = fn(jnp.asarray(hr_np[lo:lo + chunk]))
        parts0.append(np.asarray(a))
        parts1.append(np.asarray(b))
    return np.concatenate(parts0, axis=0), np.concatenate(parts1, axis=0)

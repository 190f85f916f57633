"""ClimEx dataset: host ingest + device-resident training tensors.

Equivalent capability to reference ``climex2torch`` (climex_utils.py:41-211)
with a TPU-native shape:

- ingest (h5py thread pool) materializes the HR tensor once, channels-last;
- standardization statistics are computed **eagerly on device** with one jitted
  program (no lazy first-``__getitem__`` mutation, climex_utils.py:131-137);
- the LR/HR pair synthesis is *not* done here per item — training steps call
  :func:`probunet_tpu.data.transforms.make_pair` on device-resident batches,
  so the whole data transform fuses into the step's XLA program;
- ``batch(idx)`` reproduces the reference ``__getitem__`` dict contract for
  eval/plotting code and tests.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from probunet_tpu.data import transforms
from probunet_tpu.data.netcdf import load_window


class ClimexDataset:
    def __init__(
        self,
        datadir: Optional[str] = None,
        years: Sequence[int] = range(1960, 2020),
        variables: Sequence[str] = ("pr", "tasmin", "tasmax"),
        coords: Sequence[int] = (120, 184, 120, 184),
        lowres_scale: int = 4,
        time_transform: Optional[str] = None,
        standardization: str = "perpixel",
        *,
        hr: Optional[np.ndarray] = None,          # (T, H, W, C) bypasses file ingest
        timestamps: Optional[np.ndarray] = None,  # (T,) float ns
        lat: Optional[np.ndarray] = None,
        lon: Optional[np.ndarray] = None,
        reader_workers: int = 8,
    ):
        self.variables = tuple(variables)
        self.nvars = len(self.variables)
        self.coords = tuple(coords)
        self.lowres_scale = int(lowres_scale)
        self.time_transform = time_transform
        self.standardization = standardization
        self.epsilon = transforms.EPSILON

        if hr is None:
            loaded = load_window(datadir, list(years), self.variables, self.coords,
                                 max_workers=reader_workers)
            hr = loaded["hr"]
            timestamps = loaded["timestamps"]
            lat, lon = loaded["lat"], loaded["lon"]
        self.hr_np = np.ascontiguousarray(hr, dtype=np.float32)
        self.timestamps_np = (np.asarray(timestamps, dtype=np.float64)
                              if timestamps is not None
                              else np.arange(len(hr), dtype=np.float64) * 86400e9)
        self.lat, self.lon = lat, lon
        self.years = list(years)

        self._hr_dev: Optional[jax.Array] = None
        self._stats: Optional[Tuple[jax.Array, jax.Array]] = None
        self._stats_done = False

    # ---- basic protocol ----
    def __len__(self) -> int:
        return self.hr_np.shape[0]

    @property
    def spatial_shape(self) -> Tuple[int, int]:
        return self.hr_np.shape[1], self.hr_np.shape[2]

    @property
    def dayofyear(self) -> np.ndarray:
        """Day-of-year in [0, 365), derived from the calendar dates.

        ``netcdf.decode_time`` maps noleap time axes onto real Gregorian dates,
        so ``floor(ns_since_epoch/86400e9) % 365`` would drift one day per
        leap year (~25 days over a century of training data). Subtracting each
        date's own year start instead is exact for both the noleap mapping and
        real standard-calendar data; Dec 31 of a leap year clips into bin 364.
        """
        dates = self.timestamps_np.astype(np.int64).astype("datetime64[ns]")
        year_start = dates.astype("datetime64[Y]").astype("datetime64[ns]")
        doy = (dates - year_start) / np.timedelta64(1, "D")
        return np.minimum(np.floor(doy), 364.0).astype(np.int32)

    # ---- device residency ----
    def hr_device(self, sharding=None) -> jax.Array:
        """Device-resident HR tensor, cached per placement: a call with a
        DIFFERENT sharding than the cached copy re-places the tensor (and
        replaces the cache) instead of silently returning the old placement."""
        if self._hr_dev is None or (sharding is not None
                                    and self._hr_dev.sharding != sharding):
            arr = jnp.asarray(self.hr_np)
            self._hr_dev = jax.device_put(arr, sharding) if sharding is not None else arr
        return self._hr_dev

    @property
    def stats(self) -> Optional[Tuple[jax.Array, jax.Array]]:
        """Eager device computation of the split's LR statistics."""
        if not self._stats_done:
            fn = jax.jit(transforms.compute_lr_stats,
                         static_argnames=("lowres_scale", "standardization"))
            self._stats = fn(self.hr_device(), lowres_scale=self.lowres_scale,
                             standardization=self.standardization)
            self._stats_done = True
        return self._stats

    # ---- reference __getitem__-compatible batched access ----
    def batch(self, idx) -> Dict[str, jax.Array]:
        """Batched equivalent of reference ``__getitem__`` (climex_utils.py:122-164)."""
        idx = jnp.asarray(idx)
        hr = self.hr_device()[idx]
        stats = transforms.slice_stats(self.stats, self.standardization, idx)
        out = transforms.make_pair(hr, self.lowres_scale, self.standardization, stats)
        out["timestamps"] = jnp.asarray(self.timestamps_np)[idx]
        return out

    # ---- inverse transforms (reference climex_utils.py:198-211) ----
    def invstand_residual(self, residual, stand_stats=None):
        stats = stand_stats if stand_stats is not None else self.stats
        return transforms.invstand_residual(residual, self.standardization, stats)

    def residual_to_hr(self, residual, lrinterp, stand_stats=None):
        stats = stand_stats if stand_stats is not None else self.stats
        return transforms.residual_to_hr(residual, lrinterp, self.standardization, stats)

    # ---- epoch iteration ----
    def epoch_indices(self, epoch_seed: int, batch_size: int, shuffle: bool = True,
                      drop_remainder: bool = True) -> np.ndarray:
        """(num_batches, batch_size) int array of sample indices for one epoch."""
        n = len(self)
        order = np.random.default_rng(epoch_seed).permutation(n) if shuffle else np.arange(n)
        if drop_remainder:
            nb = n // batch_size
            return order[: nb * batch_size].reshape(nb, batch_size)
        pad = (-n) % batch_size
        if pad:
            order = np.concatenate([order, order[:pad]])
        return order.reshape(-1, batch_size)

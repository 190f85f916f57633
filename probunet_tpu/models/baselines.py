"""Trivial downscaling baselines (reference baseline/models.py).

- :class:`LinearCNN` — two 3x3 convs (reference baseline/models.py:28-62). The
  reference defines a time-embedding MLP but comments it out of ``forward``;
  here it's behind ``use_time_embedding`` (default off = reference behaviour).
- :func:`bcsd` — Bias-Correction/Spatial-Disaggregation climatology scaling
  (reference baseline/models.py:10-26). The reference implementation is
  bit-rotted (reads ``datatrain.data``/``.lrinterp`` attributes that
  ``climex2torch`` never defines); this is the working version of the same
  method: day-of-year HR climatology over the train years divided by
  day-of-year LR-interp climatology, applied to the test LR-interp fields.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from probunet_tpu.models.layers import conv2d_nhwc, torch_default_init


class LinearCNN(nn.Module):
    resolution: Tuple[int, int] = (64, 64)
    in_channels: int = 3
    ds_factor: int = 4
    latent_channels: int = 10
    use_time_embedding: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, class_labels: Optional[jax.Array] = None,
                 *, train: bool = False) -> jax.Array:
        def conv(cin, cout, name):
            fan_in = cin * 9
            w = self.param(f"{name}_weight",
                           lambda key: torch_default_init(key, (3, 3, cin, cout), fan_in))
            b = self.param(f"{name}_bias",
                           lambda key: torch_default_init(key, (cout,), fan_in))
            return lambda h: conv2d_nhwc(h, w.astype(h.dtype), padding=1) + b.astype(h.dtype)

        if self.use_time_embedding and class_labels is not None:
            t = class_labels.astype(jnp.float32)
            t = nn.Dense(128)(t)
            t = nn.Dense(512)(t)
            t = nn.Dense(self.resolution[0] * self.resolution[1])(t)
            t = t.reshape(x.shape[0], *self.resolution, 1)
            x = jnp.concatenate([x, jnp.broadcast_to(t, x.shape[:3] + (1,))], axis=-1)
            cin = self.in_channels + 1
        else:
            cin = self.in_channels
        x = conv(cin, self.latent_channels, "first_conv")(x)
        x = conv(self.latent_channels, self.in_channels, "second_conv")(x)
        return x


def day_of_year_365(timestamps_ns) -> "np.ndarray":
    """Day-of-year index in [0, 365) from float-ns timestamps (host-side numpy).

    Calendar-date based: each timestamp's own year start is subtracted, which
    is exact for both real Gregorian dates and the noleap->Gregorian mapping
    ``data.netcdf.decode_time`` produces (a plain ``days_since_epoch % 365``
    drifts one day per leap year). Dec 31 of leap years clips into bin 364.
    Equivalent to ``ClimexDataset.dayofyear``."""
    ts = np.asarray(timestamps_ns, dtype=np.float64)
    dates = ts.astype(np.int64).astype("datetime64[ns]")
    year_start = dates.astype("datetime64[Y]").astype("datetime64[ns]")
    doy = (dates - year_start) / np.timedelta64(1, "D")
    return np.minimum(np.floor(doy), 364.0).astype(np.int32)


def bcsd(
    train_hr: jax.Array,          # (T_train, H, W, C) physical units
    train_lrinterp: jax.Array,    # (T_train, H, W, C)
    test_lrinterp: jax.Array,     # (T_test, H, W, C)
    train_doy: jax.Array,         # (T_train,) int day-of-year in [0, 365)
    test_doy: jax.Array,          # (T_test,) int
    epsilon: float = 1e-9,
) -> jax.Array:
    """Multiplicative day-of-year climatology correction:

        pred(t) = test_lrinterp(t) * clim_HR(doy(t)) / (clim_LRinterp(doy(t)) + eps)

    Fully vectorized with segment means (no Python day loop)."""
    num = jax.ops.segment_sum(train_hr, train_doy, num_segments=365)
    den = jax.ops.segment_sum(train_lrinterp, train_doy, num_segments=365)
    cnt = jax.ops.segment_sum(jnp.ones_like(train_doy, dtype=train_hr.dtype),
                              train_doy, num_segments=365)
    cnt = jnp.maximum(cnt, 1.0)[:, None, None, None]
    clim_hr = num / cnt
    clim_lr = den / cnt
    scale = clim_hr / (clim_lr + epsilon)
    return test_lrinterp * scale[test_doy]

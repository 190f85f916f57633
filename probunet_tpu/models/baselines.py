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


class ConvVAE(nn.Module):
    """Conditional conv-VAE downscaler — the reference's ``vae`` ds_model
    choice (trainmodel.py:33) which is DEAD there (baseline/main.py:47-54
    never dispatches it and no VAE model exists), made live.

    Same probabilistic surface as :class:`~probunet_tpu.models.ProbabilisticUNet`
    (``elbo`` / ``sample`` / ``__call__`` with a ``latent`` rng collection), so
    the entire prob-U-Net machinery — fused train step, seeded stochastic
    eval, vmapped ensemble sampler, CRPS eval, serving — serves it unchanged.
    The differences are the classic-VAE simplifications: a FIXED standard
    normal prior (vs the learned prior network) and a light conv feature
    stack (vs the ADM U-Net backbone); the posterior encoder reuses
    AxisAlignedConvGaussian.
    """

    input_channels: int
    num_classes: int
    latent_dim: int = 6
    num_filters: Tuple[int, ...] = (32, 64)
    beta: float = 1.0
    decoder_channels: int = 64

    def setup(self):
        from probunet_tpu.models.prob_unet import (AxisAlignedConvGaussian,
                                                   Fcomb, _TorchConv)

        self.posterior = AxisAlignedConvGaussian(
            self.input_channels, tuple(self.num_filters), self.latent_dim,
            posterior=True)
        self.enc0 = _TorchConv(self.input_channels, self.decoder_channels, 3)
        self.enc1 = _TorchConv(self.decoder_channels, self.decoder_channels, 3)
        self.fcomb = Fcomb(self.decoder_channels, self.latent_dim,
                           self.num_classes)

    def _features(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(self.enc1(jax.nn.relu(self.enc0(x))))

    def _prior(self, batch: int):
        from probunet_tpu.ops.distributions import DiagGaussian

        zero = jnp.zeros((batch, self.latent_dim), jnp.float32)
        return DiagGaussian(zero, zero)  # N(0, I)

    def __call__(self, x, target=None, training: bool = True, *,
                 train: bool = False) -> jax.Array:
        features = self._features(x)
        dist = (self.posterior(x, target) if training and target is not None
                else self._prior(x.shape[0]))
        z = dist.rsample(self.make_rng("latent"))
        return self.fcomb(features, z)

    def elbo(self, x, target, beta=None, *, train: bool = True):
        """sum-MSE + beta * KL(q(z|x,y) || N(0,I)); fp32, (total, recon, kl)."""
        from probunet_tpu.ops.distributions import kl_diag_gaussian

        features = self._features(x)
        posterior = self.posterior(x, target)
        z = posterior.rsample(self.make_rng("latent"))
        out = self.fcomb(features, z)
        diff = out.astype(jnp.float32) - target.astype(jnp.float32)
        recon = jnp.sum(jnp.square(diff))
        kl = kl_diag_gaussian(posterior, self._prior(x.shape[0])).sum()
        b = self.beta if beta is None else beta
        return recon + b * kl, recon, kl

    def sample(self, x, num_samples: int) -> jax.Array:
        """K standard-normal draws, features computed once, decode folded into
        the batch axis (the ProbabilisticUNet.sample idiom). (B, K, H, W, C)."""
        features = self._features(x)
        zs = self._prior(x.shape[0]).sample(self.make_rng("latent"), num_samples)
        k = num_samples
        b, h, w, c = features.shape
        feats = jnp.broadcast_to(features[None], (k, b, h, w, c)).reshape(k * b, h, w, c)
        outs = self.fcomb(feats, zs.reshape(k * b, -1))
        outs = outs.reshape(k, b, h, w, self.num_classes)
        return jnp.swapaxes(outs, 0, 1)

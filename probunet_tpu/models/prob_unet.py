"""Probabilistic U-Net (Kohl et al. style), reference prob_unet.py:8-234.

TPU-first deltas from the reference:

- explicit PRNG threading (flax rng collections ``latent`` / ``dropout``)
  instead of torch global RNG;
- ``sample()`` draws K latents and **vmaps the Fcomb tail over them while the
  U-Net features are computed once** — the reference recomputes the entire
  U-Net per ensemble member (train_prob_unet_model.py:179-182);
- the ELBO is computed in float32 regardless of compute dtype, and ``beta`` is
  a live argument (the reference's ``args.beta`` is never wired through,
  main.py:32-37 — we default to the model's beta but allow overrides/schedules).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from probunet_tpu.models.layers import conv2d_nhwc, torch_default_init
from probunet_tpu.models.unet import UNet
from probunet_tpu.ops.distributions import DiagGaussian, kl_diag_gaussian


class _TorchConv(nn.Module):
    """Stock conv with torch-default init (the reference builds prior/posterior/
    Fcomb from plain ``nn.Conv2d``, prob_unet.py:33,41,92-97)."""

    in_channels: int
    out_channels: int
    kernel: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        fan_in = self.in_channels * k * k
        w = self.param("weight", lambda key: torch_default_init(
            key, (k, k, self.in_channels, self.out_channels), fan_in))
        b = self.param("bias", lambda key: torch_default_init(
            key, (self.out_channels,), fan_in))
        y = conv2d_nhwc(x, w.astype(x.dtype), padding=k // 2)
        return y + b.astype(x.dtype).reshape(1, 1, 1, -1)


class AxisAlignedConvGaussian(nn.Module):
    """Conv encoder emitting a diagonal Gaussian over the latent space
    (reference prob_unet.py:8-78)."""

    input_channels: int
    num_filters: Tuple[int, ...]
    latent_dim: int
    posterior: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, target: Optional[jax.Array] = None) -> DiagGaussian:
        if self.posterior and target is not None:
            x = jnp.concatenate([x, target], axis=-1)
        cin = self.input_channels * (2 if self.posterior else 1)
        for i, cout in enumerate(self.num_filters):
            x = _TorchConv(cin, cout, 3, name=f"enc_{i}")(x)
            x = jax.nn.relu(x)
            # AvgPool2d(2,2) stage (prob_unet.py:35)
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
            cin = cout
        h = x.mean(axis=(1, 2), keepdims=True)  # global average pool (prob_unet.py:64)
        mu = _TorchConv(cin, self.latent_dim, 1, name="conv_mu")(h)[:, 0, 0, :]
        log_sigma = _TorchConv(cin, self.latent_dim, 1, name="conv_log_sigma")(h)[:, 0, 0, :]
        # Distribution parameters in fp32 for stable KL/sampling under bf16 compute.
        return DiagGaussian(mu.astype(jnp.float32), log_sigma.astype(jnp.float32))


class Fcomb(nn.Module):
    """Fuses U-Net features with the latent z via 1x1 convs (prob_unet.py:80-121)."""

    unet_output_channels: int
    latent_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, feature_map: jax.Array, z: jax.Array) -> jax.Array:
        b, h, w, c = feature_map.shape
        zmap = jnp.broadcast_to(z[:, None, None, :].astype(feature_map.dtype),
                                (b, h, w, self.latent_dim))
        x = jnp.concatenate([feature_map, zmap], axis=-1)
        x = jax.nn.relu(_TorchConv(c + self.latent_dim, c, 1, name="layer0")(x))
        x = jax.nn.relu(_TorchConv(c, c, 1, name="layer1")(x))
        return _TorchConv(c, self.num_classes, 1, name="layer2")(x)


class ProbabilisticUNet(nn.Module):
    """U-Net backbone + prior/posterior Gaussians + Fcomb (prob_unet.py:123-234)."""

    input_channels: int
    num_classes: int
    latent_dim: int = 6
    num_filters: Tuple[int, ...] = (64, 128, 256, 512)
    beta: float = 1.0
    img_resolution: Tuple[int, int] = (64, 64)  # reference hardcodes (64,64) (prob_unet.py:138)
    dropout: float = 0.10
    model_channels: int = 128                   # U-Net width (reference networks.py:232)
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    fast_attention: bool = False
    remat: bool = False

    def setup(self):
        self.unet = UNet(
            img_resolution=self.img_resolution,
            in_channels=self.input_channels,
            out_channels=self.num_filters[0],
            label_dim=0,
            use_diffuse=False,
            dropout=self.dropout,
            model_channels=self.model_channels,
            channel_mult=self.channel_mult,
            num_blocks=self.num_blocks,
            attn_resolutions=self.attn_resolutions,
            fast_attention=self.fast_attention,
            remat=self.remat,
        )
        self.prior = AxisAlignedConvGaussian(
            self.input_channels, tuple(self.num_filters), self.latent_dim, posterior=False)
        self.posterior = AxisAlignedConvGaussian(
            self.input_channels, tuple(self.num_filters), self.latent_dim, posterior=True)
        self.fcomb = Fcomb(self.num_filters[0], self.latent_dim, self.num_classes)

    def __call__(
        self,
        x: jax.Array,
        target: Optional[jax.Array] = None,
        training: bool = True,
        *,
        train: bool = False,
    ) -> jax.Array:
        """Single forward draw: posterior z in training, prior z at inference
        (prob_unet.py:168-196). ``train`` controls dropout; ``training``
        controls which latent space is sampled (reference naming kept)."""
        features = self.unet(x, train=train)
        if training and target is not None:
            dist = self.posterior(x, target)
        else:
            dist = self.prior(x)
        z = dist.rsample(self.make_rng("latent"))
        return self.fcomb(features, z)

    def elbo(
        self,
        x: jax.Array,
        target: jax.Array,
        beta: Optional[jax.Array] = None,
        *,
        train: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """ELBO = sum-MSE reconstruction + beta * sum-KL (prob_unet.py:198-234).

        Sum reductions (not mean) exactly as the reference; fp32 accumulation.
        Returns (total, recon, kl).
        """
        features = self.unet(x, train=train)
        prior = self.prior(x)
        posterior = self.posterior(x, target)
        z = posterior.rsample(self.make_rng("latent"))
        out = self.fcomb(features, z)
        diff = out.astype(jnp.float32) - target.astype(jnp.float32)
        recon = jnp.sum(jnp.square(diff))
        kl = kl_diag_gaussian(posterior, prior).sum()
        b = self.beta if beta is None else beta
        return recon + b * kl, recon, kl

    def reconstruct(self, x: jax.Array, z: jax.Array, *, train: bool = False) -> jax.Array:
        """Deterministic decode with a supplied latent (no sampling)."""
        return self.fcomb(self.unet(x, train=train), z)

    def elbo_with_z(self, x: jax.Array, target: jax.Array, z: jax.Array,
                    beta: Optional[jax.Array] = None, *, train: bool = False):
        """ELBO with an externally supplied posterior draw — the deterministic
        parity-harness variant (same math as :meth:`elbo`, no sampling)."""
        features = self.unet(x, train=train)
        prior = self.prior(x)
        posterior = self.posterior(x, target)
        out = self.fcomb(features, z)
        diff = out.astype(jnp.float32) - target.astype(jnp.float32)
        recon = jnp.sum(jnp.square(diff))
        kl = kl_diag_gaussian(posterior, prior).sum()
        b = self.beta if beta is None else beta
        return recon + b * kl, recon, kl

    def latent_dists(self, x: jax.Array, target: Optional[jax.Array] = None):
        """Returns (prior, posterior) DiagGaussians; posterior is None without a target."""
        prior = self.prior(x)
        posterior = self.posterior(x, target) if target is not None else None
        return prior, posterior

    def sample(self, x: jax.Array, num_samples: int) -> jax.Array:
        """K prior-draw ensemble: U-Net features computed ONCE, Fcomb vmapped
        over K latents (BASELINE config #3). Returns (B, K, H, W, C)."""
        features = self.unet(x, train=False)
        prior = self.prior(x)
        zs = prior.sample(self.make_rng("latent"), num_samples)  # (K, B, D)
        k = num_samples
        b, h, w, c = features.shape
        # Fold the K draws into the batch axis (equivalent to vmapping the
        # Fcomb tail; keeps everything one big batched matmul on the MXU).
        feats = jnp.broadcast_to(features[None], (k, b, h, w, c)).reshape(k * b, h, w, c)
        outs = self.fcomb(feats, zs.reshape(k * b, -1))
        outs = outs.reshape(k, b, h, w, self.num_classes)
        return jnp.swapaxes(outs, 0, 1)

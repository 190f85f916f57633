"""EDM preconditioning wrapper (reference networks.py:339-389).

Present for capability parity — the reference ships it in both network files
though no entry point instantiates it. Wraps any backbone model with the EDM
c_skip/c_out/c_in/c_noise scalings so the framework can train diffusion-style
denoisers on the same data path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from probunet_tpu.models.unet import UNet


class EDMPrecond(nn.Module):
    img_resolution: Tuple[int, int]
    in_channels: int
    out_channels: int
    label_dim: int = 0
    use_bf16: bool = False          # reference's use_fp16; bf16 is the TPU dtype
    sigma_min: float = 0.0
    sigma_max: float = float("inf")
    sigma_data: float = 1.0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    dropout: float = 0.10
    # Threaded to the backbone UNet exactly as ProbabilisticUNet does
    # (prob_unet.py:108-124): the reference's fp16 knob on this wrapper
    # (networks.py:374) is the precision lever its dead code carries;
    # fast_attention is the live bf16-QK^T analogue, and remat is what lets
    # the 256x256 diffusion configuration train within HBM.
    fast_attention: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # (B, H, W, C) noisy input
        sigma: jax.Array,                  # (B,) or scalar noise levels
        condition_img: Optional[jax.Array] = None,
        class_labels: Optional[jax.Array] = None,
        force_fp32: bool = True,
        *,
        train: bool = False,
    ) -> jax.Array:
        in_img = x if condition_img is None else jnp.concatenate([x, condition_img], axis=-1)
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        if self.label_dim:
            class_labels = (jnp.zeros((1, self.label_dim), jnp.float32)
                            if class_labels is None
                            else class_labels.astype(jnp.float32).reshape(-1, self.label_dim))
        else:
            class_labels = None
        dtype = jnp.bfloat16 if (self.use_bf16 and not force_fp32) else jnp.float32

        c_skip = self.sigma_data ** 2 / (sigma ** 2 + self.sigma_data ** 2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)
        c_in = 1 / jnp.sqrt(self.sigma_data ** 2 + sigma ** 2)
        c_noise = jnp.log(sigma) / 4

        model = UNet(
            img_resolution=self.img_resolution,
            in_channels=in_img.shape[-1],
            out_channels=self.out_channels,
            label_dim=self.label_dim,
            model_channels=self.model_channels,
            channel_mult=self.channel_mult,
            num_blocks=self.num_blocks,
            attn_resolutions=self.attn_resolutions,
            dropout=self.dropout,
            use_diffuse=True,
            fast_attention=self.fast_attention,
            remat=self.remat,
            name="model",
        )
        f_x = model((c_in * in_img).astype(dtype), noise_labels=c_noise.flatten(),
                    class_labels=class_labels, train=train).astype(dtype)
        return c_skip * x + c_out * f_x.astype(jnp.float32)

    @staticmethod
    def round_sigma(sigma) -> jax.Array:
        return jnp.asarray(sigma)

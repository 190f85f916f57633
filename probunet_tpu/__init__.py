"""probunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for probabilistic
climate downscaling, with the full capability surface of the PyTorch reference
``pierrelouislemaire/prob-unet-mds`` (see SURVEY.md): ClimEx netCDF ingest,
LR/HR pair synthesis, four standardization modes, an ADM-style U-Net backbone,
a Probabilistic U-Net (axis-aligned Gaussian prior/posterior + Fcomb fusion),
deterministic/LinearCNN/BCSD baselines, ELBO/CRPS/MAE training & evaluation,
vmapped ensemble inference, checkpointing, logging/sweeps and map plotting.

Unlike the reference, the entire training step (pair synthesis -> ELBO ->
grad -> AdamW) compiles into a single sharded XLA program over a
``jax.sharding.Mesh``, with data resident in HBM and fused Pallas kernels on
the hot normalization paths.
"""

__version__ = "0.1.0"

from probunet_tpu.config import Config, get_config  # noqa: F401

__all__ = ["Config", "get_config"]


def __getattr__(name):
    """Lazy top-level API (avoids importing jax/flax for config-only use)."""
    if name in ("ProbabilisticUNet", "UNet", "LinearCNN", "EDMPrecond", "bcsd"):
        import probunet_tpu.models as m
        return getattr(m, name)
    if name == "ClimexDataset":
        from probunet_tpu.data.dataset import ClimexDataset
        return ClimexDataset
    if name in ("train_probunet", "train_baseline"):
        import probunet_tpu.train.loop as loop
        return getattr(loop, name)
    if name == "downscale":
        from probunet_tpu.serve import downscale
        return downscale
    raise AttributeError(f"module 'probunet_tpu' has no attribute {name!r}")

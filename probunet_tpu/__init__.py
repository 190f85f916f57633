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

from probunet_tpu.config import Config  # noqa: F401

from probunet_tpu.ops.resample import (  # noqa: F401
    avg_pool,
    bilinear_upsample,
    nearest_upsample_2x,
    avg_pool_2x,
)
from probunet_tpu.ops.norm import group_norm, num_groups_for  # noqa: F401
from probunet_tpu.ops.distributions import DiagGaussian, kl_diag_gaussian  # noqa: F401
from probunet_tpu.ops.crps import crps_empirical, crps_naive  # noqa: F401

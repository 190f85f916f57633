from probunet_tpu.data.transforms import (  # noqa: F401
    compute_lr_stats,
    make_pair,
    invstand_residual,
    residual_to_hr,
)
from probunet_tpu.data.dataset import ClimexDataset  # noqa: F401
from probunet_tpu.data.units import (  # noqa: F401
    kgm2s_to_mmday,
    k_to_c,
    log_inv,
    date_to_float,
    float_to_date,
)

from probunet_tpu.models.layers import Conv2d, Linear, GroupNorm, Init  # noqa: F401
from probunet_tpu.models.unet import UNet, UNetBlock, build_unet_plan  # noqa: F401
from probunet_tpu.models.prob_unet import (  # noqa: F401
    AxisAlignedConvGaussian,
    Fcomb,
    ProbabilisticUNet,
)
from probunet_tpu.models.baselines import ConvVAE, LinearCNN, bcsd  # noqa: F401
from probunet_tpu.models.edm import EDMPrecond  # noqa: F401

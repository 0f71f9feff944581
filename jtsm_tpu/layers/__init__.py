from .aspp import ASPP
from .batch_norm import (
    FrozenBatchNorm2d,
    GroupNorm32,
    NaiveSyncBatchNorm,
    get_norm,
)
from .blocks import CNNBlockBase, DepthwiseSeparableConv2d

# deprecated reference alias (detectron2/modeling/backbone/resnet.py keeps
# ResNetBlockBase = CNNBlockBase for backward compatibility)
ResNetBlockBase = CNNBlockBase
from .deform_conv import DeformConv, ModulatedDeformConv, deform_conv2d
from .shape_spec import ShapeSpec
from .wrappers import (
    Conv2d,
    ConvTranspose2d,
    Linear,
    cat,
    interpolate_bilinear,
    interpolate_nearest,
    nonzero_tuple,
)

__all__ = [k for k in globals().keys() if not k.startswith("_")]

from .aspp import ASPP
from .batch_norm import (
    BatchNorm2d,
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
    interpolate,
    interpolate_bilinear,
    interpolate_nearest,
    nonzero_tuple,
)

# the reference exposes the op family through detectron2.layers
# (layers/__init__.py) — mirror that surface over the TPU-native ops
from ..ops.nms import (
    batched_nms,
    batched_nms_rotated,
    nms,
    nms_rotated,
)
from ..ops.paste_masks import paste_masks_in_image
from ..ops.roi_align import ROIAlign, roi_align
from ..ops.roi_align_rotated import ROIAlignRotated, roi_align_rotated

__all__ = [k for k in globals().keys() if not k.startswith("_")]

"""DeepLab V3/V3+ semantic segmentation (reference: projects/DeepLab)."""

from .config import add_deeplab_config
from .loss import DeepLabCE
from .resnet import build_resnet_deeplab_backbone
from .semantic_seg import DeepLabV3Head, DeepLabV3PlusHead

__all__ = [
    "add_deeplab_config",
    "DeepLabCE",
    "DeepLabV3Head",
    "DeepLabV3PlusHead",
    "build_resnet_deeplab_backbone",
]

"""Panoptic-DeepLab (reference: projects/Panoptic-DeepLab — box-free panoptic
via semantic seg + instance center/offset regression)."""

from .config import add_panoptic_deeplab_config
from .panoptic_seg import PanopticDeepLab
from .post_processing import get_panoptic_segmentation
from .target_generator import panoptic_deeplab_targets

__all__ = [
    "add_panoptic_deeplab_config",
    "PanopticDeepLab",
    "get_panoptic_segmentation",
    "panoptic_deeplab_targets",
]

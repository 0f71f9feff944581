"""Panoptic-DeepLab (reference: projects/Panoptic-DeepLab — box-free panoptic
via semantic seg + instance center/offset regression)."""

import os as _os
import sys as _sys

# Panoptic-DeepLab builds on the DeepLab project (the reference imports
# detectron2.projects.deeplab); make the sibling project importable.
_sys.path.insert(
    0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "..", "DeepLab")
)

from .config import add_panoptic_deeplab_config
from .dataset_mapper import PanopticDeeplabDatasetMapper
from .panoptic_seg import PanopticDeepLab, PanopticDeepLabSemSegHead
from .post_processing import get_panoptic_segmentation
from .target_generator import panoptic_deeplab_targets

__all__ = [
    "add_panoptic_deeplab_config",
    "PanopticDeeplabDatasetMapper",
    "PanopticDeepLab",
    "get_panoptic_segmentation",
    "panoptic_deeplab_targets",
]

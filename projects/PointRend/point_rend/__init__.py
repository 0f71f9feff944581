"""PointRend (reference: projects/PointRend — iterative point-based mask
refinement)."""

from .config import add_pointrend_config
from .point_features import (
    generate_regular_grid_point_coords,
    get_uncertain_point_coords_on_grid,
    get_uncertain_point_coords_with_randomness,
    point_sample,
)
from .point_head import StandardPointHead
from .roi_heads import CoarseMaskHead, PointRendMaskHead, PointRendROIHeads
from .semantic_seg import PointRendSemSegHead
from .color_augmentation import ColorAugSSDTransform

__all__ = [
    "PointRendSemSegHead",
    "ColorAugSSDTransform",
    "add_pointrend_config",
    "point_sample",
    "generate_regular_grid_point_coords",
    "get_uncertain_point_coords_on_grid",
    "get_uncertain_point_coords_with_randomness",
    "StandardPointHead",
    "CoarseMaskHead",
    "PointRendMaskHead",
    "PointRendROIHeads",
]

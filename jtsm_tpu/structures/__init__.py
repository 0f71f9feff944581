from .boxes import (
    BoxMode,
    Boxes,
    box_area,
    box_centers,
    boxes_inside_box,
    clip_boxes,
    matched_boxlist_iou,
    matched_pairwise_iou,
    nonempty_boxes,
    pairwise_intersection,
    pairwise_ioa,
    pairwise_iou,
    scale_boxes,
    unique_boxes,
)
from .image_list import ImageList
from .instances import Instances
from .keypoints import Keypoints, heatmaps_to_keypoints, keypoints_to_heatmap
from .masks import (
    BitMasks,
    PolygonMasks,
    polygons_to_bitmask,
    rasterize_polygons_within_box,
)
from .rotated_boxes import RotatedBoxes, pairwise_iou_rotated

__all__ = [k for k in globals().keys() if not k.startswith("_")]

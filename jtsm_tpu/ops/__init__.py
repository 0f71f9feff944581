from .box_regression import Box2BoxTransform, Box2BoxTransformRotated
from .losses import (
    binary_cross_entropy_with_logits,
    giou_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from .matcher import Matcher
from .nms import (
    batched_nms,
    batched_nms_mask,
    batched_nms_rotated_mask,
    nms,
    nms_mask,
    nms_rotated_mask,
)
from .paste_masks import paste_masks_in_image
from .roi_align import roi_align, roi_align_batched, roi_align_multilevel
from .sampling import subsample_labels

__all__ = [k for k in globals().keys() if not k.startswith("_")]

"""TridentNet (reference: projects/TridentNet — scale-aware multi-branch
detection via weight-shared dilated convs).

TPU re-design: the trident block IS the wsl MRRPConv (same weight-shared
multi-dilation idea, reference notes the equivalence); the trident backbone
runs the res4 stage with N parallel dilation branches, and the RPN/RCNN see
the branches as extra batch entries.
"""

from .config import add_tridentnet_config
from .trident_backbone import TridentResNet, build_trident_resnet_backbone
from .trident_rcnn import TridentRes5ROIHeads, TridentRPN, merge_branch_detections

__all__ = [
    "add_tridentnet_config",
    "TridentResNet",
    "build_trident_resnet_backbone",
    "TridentRPN",
    "TridentRes5ROIHeads",
    "merge_branch_detections",
]

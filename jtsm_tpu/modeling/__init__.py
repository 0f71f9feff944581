from .anchor_generator import (
    ANCHOR_GENERATOR_REGISTRY,
    DefaultAnchorGenerator,
    RotatedAnchorGenerator,
    build_anchor_generator,
)
from .backbone.backbone import Backbone
from .backbone.build import BACKBONE_REGISTRY, build_backbone
from .backbone.fpn import FPN, build_resnet_fpn_backbone, build_retinanet_resnet_fpn_backbone
from .backbone.resnet import ResNet, build_resnet_backbone
from .meta_arch.build import META_ARCH_REGISTRY, build_model
from .meta_arch.panoptic_fpn import PanopticFPN, combine_semantic_and_instance_outputs
from .meta_arch.rcnn import GeneralizedRCNN, ProposalNetwork
from .meta_arch.retinanet import RetinaNet, RetinaNetHead
from .meta_arch.semantic_seg import (
    SEM_SEG_HEADS_REGISTRY,
    SemanticSegmentor,
    SemSegFPNHead,
    build_sem_seg_head,
)
from .poolers import ROIPooler, assign_boxes_to_levels
from .postprocessing import (
    detector_postprocess,
    detector_postprocess_batched,
    sem_seg_postprocess,
)
from .test_time_augmentation import (
    DatasetMapperTTA,
    GeneralizedRCNNWithTTA,
    GeneralizedRCNNWithTTAAVG,
)
from .proposal_generator.rpn import (
    PROPOSAL_GENERATOR_REGISTRY,
    RPN,
    RPN_HEAD_REGISTRY,
    StandardRPNHead,
    build_proposal_generator,
    build_rpn_head,
)
from .backbone.resnet import make_stage
from .roi_heads.box_head import ROI_BOX_HEAD_REGISTRY, FastRCNNConvFCHead, build_box_head
from .roi_heads.fast_rcnn import FastRCNNOutputLayers
from .roi_heads.mask_head import (
    ROI_MASK_HEAD_REGISTRY,
    BaseMaskRCNNHead,
    MaskRCNNConvUpsampleHead,
    build_mask_head,
)
from .roi_heads.keypoint_head import (
    ROI_KEYPOINT_HEAD_REGISTRY,
    BaseKeypointRCNNHead,
    KRCNNConvDeconvUpsampleHead,
    build_keypoint_head,
)
from .roi_heads.cascade_rcnn import CascadeROIHeads
from .roi_heads.res5_roi_heads import Res5ROIHeads
from .roi_heads.roi_heads import (
    ROI_HEADS_REGISTRY,
    ROIHeads,
    StandardROIHeads,
    build_roi_heads,
    select_foreground_proposals,
)
from .roi_heads.rotated_fast_rcnn import RROIHeads

__all__ = [k for k in globals().keys() if not k.startswith("_")]

"""Public WSL modeling surface (reference projects/WSL/wsl/modeling/__init__.py)."""

from .meta_arch import GeneralizedMCNNWSL, GeneralizedRCNNWSL
from .resnet_wsl import (
    build_mrrp_wsl_resnet_backbone,
    build_wsl_resnet_backbone,
    build_wsl_resnet_v2_backbone,
)
from .roi_heads_jtsm import JTSMROIHeads
from .roi_heads_wsl import (
    DiscriminativeAdaptionNeck,
    OICRROIHeads,
    WSDDNROIHeads,
)
from .rpn_wsl import RPNWSL
from .seg_heads import TwoClassHead
from .vgg import build_mrrp_vgg_backbone, build_vgg_backbone
from .wsjds import CSCROIHeads, WSJDSROIHeads
from .wsod_zoo import (
    CMILROIHeads,
    ContextLocNetROIHeads,
    PCLROIHeads,
    UWSODROIHeads,
)

# the WSOD TTA machinery is core (modeling/test_time_augmentation.py); the
# reference exposes it through wsl.modeling
from ...modeling.test_time_augmentation import (
    DatasetMapperTTAAVG,
    DatasetMapperTTAUNION,
    GeneralizedRCNNWithTTAAVG,
    GeneralizedRCNNWithTTAUNION,
)
from ...modeling.postprocessing import detector_postprocess

__all__ = [k for k in globals().keys() if not k.startswith("_")]

"""DensePose (reference: projects/DensePose — dense human UV estimation).

Covers: config, the chart-based IUV head, DensePoseROIHeads wiring (patch
classification + UV regression on person ROIs), IUV point-target data
plumbing + dataset registration (densepose/data.py), GPS-based evaluation
(densepose/evaluation.py), and the HRNet/HRFPN backbone family (hrnet.py).
"""

from .config import add_densepose_config, add_hrnet_config
from .hrnet import HRFPN, HRNet, build_hrfpn_backbone, build_pose_hrnet_backbone
from .modeling.confidence import (
    DensePoseConfidenceModelConfig,
    DensePoseUVConfidenceType,
)
from .modeling.cse import Embedder, VertexDirectEmbedder, VertexFeatureEmbedder
from .modeling.heads import (
    ROI_DENSEPOSE_HEAD_REGISTRY,
    DensePoseDeepLabHead,
    build_densepose_head,
)
from .modeling.losses import DENSEPOSE_LOSS_REGISTRY, build_densepose_losses
from .modeling.predictors import (
    DENSEPOSE_PREDICTOR_REGISTRY,
    DensePoseChartPredictor,
    DensePoseChartWithConfidencePredictor,
    build_densepose_predictor,
)
from .converters import (
    HFlipConverter,
    ToChartResultConverter,
    ToMaskConverter,
    densepose_chart_predictor_output_hflip,
)
from .data_samplers import (
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    MaskFromDensePoseSampler,
    PredictionToGroundTruthSampler,
)
from .data import register_builtin  # noqa: F401 — registers builtin datasets
from .roi_heads import DensePoseROIHeads, DensePoseV1ConvXHead
from .test_time_augmentation import DensePoseGeneralizedRCNNWithTTA
from .video import (
    CombinedDataLoader,
    FirstKFramesSelector,
    ImageListDataset,
    InferenceBasedLoader,
    LastKFramesSelector,
    RandomKFramesSelector,
    VideoKeyframeDataset,
)
from .vis import DensePoseOutputsExtractor, DensePoseResultsVisualizer

__all__ = [
    "add_densepose_config",
    "add_hrnet_config",
    "DensePoseROIHeads",
    "DensePoseV1ConvXHead",
    "DensePoseDeepLabHead",
    "DensePoseChartPredictor",
    "DensePoseChartWithConfidencePredictor",
    "DensePoseConfidenceModelConfig",
    "DensePoseUVConfidenceType",
    "Embedder",
    "VertexDirectEmbedder",
    "VertexFeatureEmbedder",
    "ROI_DENSEPOSE_HEAD_REGISTRY",
    "DENSEPOSE_PREDICTOR_REGISTRY",
    "DENSEPOSE_LOSS_REGISTRY",
    "build_densepose_head",
    "build_densepose_predictor",
    "build_densepose_losses",
    "HRNet",
    "HRFPN",
    "build_pose_hrnet_backbone",
    "build_hrfpn_backbone",
]

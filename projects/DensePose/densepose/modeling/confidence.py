"""Confidence-model configuration (reference:
projects/DensePose/densepose/modeling/confidence.py).

Statistical models for UV / segmentation confidence learning, after
N. Neverova, D. Novotny, A. Vedaldi, "Correlated Uncertainty for Learning
Dense Correspondences from Noisy Labels", NeurIPS 2019.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class DensePoseUVConfidenceType(Enum):
    IID_ISO = "iid_iso"
    INDEP_ANISO = "indep_aniso"


@dataclass
class DensePoseUVConfidenceConfig:
    enabled: bool = False
    epsilon: float = 0.01  # lower bound on UV confidences
    type: DensePoseUVConfidenceType = DensePoseUVConfidenceType.IID_ISO


@dataclass
class DensePoseSegmConfidenceConfig:
    enabled: bool = False
    epsilon: float = 0.01


@dataclass
class DensePoseConfidenceModelConfig:
    uv_confidence: DensePoseUVConfidenceConfig = field(
        default_factory=DensePoseUVConfidenceConfig
    )
    segm_confidence: DensePoseSegmConfidenceConfig = field(
        default_factory=DensePoseSegmConfidenceConfig
    )

    @staticmethod
    def from_cfg(cfg) -> "DensePoseConfidenceModelConfig":
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return DensePoseConfidenceModelConfig(
            uv_confidence=DensePoseUVConfidenceConfig(
                enabled=dp.UV_CONFIDENCE.ENABLED,
                epsilon=dp.UV_CONFIDENCE.EPSILON,
                type=DensePoseUVConfidenceType(dp.UV_CONFIDENCE.TYPE),
            ),
            segm_confidence=DensePoseSegmConfidenceConfig(
                enabled=dp.SEGM_CONFIDENCE.ENABLED,
                epsilon=dp.SEGM_CONFIDENCE.EPSILON,
            ),
        )

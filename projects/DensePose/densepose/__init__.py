"""DensePose (reference: projects/DensePose — dense human UV estimation).

Covers: config, the chart-based IUV head, DensePoseROIHeads wiring (patch
classification + UV regression on person ROIs), IUV point-target data
plumbing + dataset registration (densepose/data.py), GPS-based evaluation
(densepose/evaluation.py), and the HRNet/HRFPN backbone family (hrnet.py).
"""

from .config import add_densepose_config, add_hrnet_config
from .hrnet import HRFPN, HRNet, build_hrfpn_backbone, build_pose_hrnet_backbone
from .roi_heads import DensePoseROIHeads, DensePoseV1ConvXHead
from .vis import DensePoseOutputsExtractor, DensePoseResultsVisualizer

__all__ = [
    "add_densepose_config",
    "add_hrnet_config",
    "DensePoseROIHeads",
    "DensePoseV1ConvXHead",
    "HRNet",
    "HRFPN",
    "build_pose_hrnet_backbone",
    "build_hrfpn_backbone",
]

"""DensePose (reference: projects/DensePose — dense human UV estimation).

Round-1 scope: config, the chart-based IUV head, DensePoseROIHeads wiring
(patch classification + UV regression on person ROIs). The full data
pipeline (IUV gt ingestion) and GPS/GPSm evaluation follow in later rounds.
"""

from .config import add_densepose_config
from .roi_heads import DensePoseROIHeads, DensePoseV1ConvXHead

__all__ = ["add_densepose_config", "DensePoseROIHeads", "DensePoseV1ConvXHead"]

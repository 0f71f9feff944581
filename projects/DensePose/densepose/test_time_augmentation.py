"""DensePose test-time augmentation (reference:
projects/DensePose/densepose/modeling/test_time_augmentation.py
``DensePoseGeneralizedRCNNWithTTA`` — standard box TTA, then the densepose
head re-runs on the merged boxes per augmentation and hflipped chart
outputs are converted back via the hflip converter).

Here: the core GeneralizedRCNNWithTTA merges boxes across scales/flips;
DensePose chart maps from the flipped pass are un-flipped with
``densepose_chart_predictor_output_hflip`` (spatial mirror + left/right
part swap + optional UV symmetry tables) and averaged with the unflipped
pass — chart maps are box-normalized, so averaging per detection is exact.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from jtsm_tpu.modeling.test_time_augmentation import GeneralizedRCNNWithTTA

from .converters import densepose_chart_predictor_output_hflip


class DensePoseGeneralizedRCNNWithTTA(GeneralizedRCNNWithTTA):
    def __init__(self, *args, uv_symmetries: Optional[Dict[str, np.ndarray]] = None, **kw):
        super().__init__(*args, **kw)
        self.uv_symmetries = uv_symmetries

    def _convert_flipped_outputs(self, outputs: Dict[str, np.ndarray]):
        """Hook: un-flip DensePose chart maps from hflip passes."""
        if "dp_patch" not in outputs:
            return outputs
        return densepose_chart_predictor_output_hflip(outputs, self.uv_symmetries)

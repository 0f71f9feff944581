"""DensePose result visualization (reference: projects/DensePose/densepose/vis/
— base.py, densepose_results.py, bounding_box.py, extractor.py).

Paints the per-detection chart outputs produced by
``DensePoseROIHeads._forward_extra_inference`` (``dp_patch``/``dp_u``/``dp_v``,
each (B, D, S, S) in box-normalized coordinates) onto the original image:

* fine segmentation: 24 body-part colors alpha-blended inside each box
* U / V: value-mapped pseudocolor (the reference's ``DensePoseResultsU/
  VVisualizer``)
* boxes + scores via the core Visualizer.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from jtsm_tpu.utils.colormap import colormap

N_PART_LABELS = 24


class DensePoseResultsVisualizer:
    """mode: 'segm' (part colors), 'u' or 'v' (pseudocolor values)."""

    def __init__(self, mode: str = "segm", alpha: float = 0.6,
                 score_thresh: float = 0.5):
        assert mode in ("segm", "u", "v"), mode
        self.mode = mode
        self.alpha = alpha
        self.score_thresh = score_thresh
        self._part_colors = colormap(rgb=True, maximum=255)[:N_PART_LABELS + 1]

    def _chart_to_rgb(self, patch: np.ndarray, values: Optional[np.ndarray]):
        if self.mode == "segm":
            return self._part_colors[np.clip(patch, 0, N_PART_LABELS)]
        # u/v in [0,1] -> simple jet-like ramp
        x = np.clip(values, 0.0, 1.0)
        r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
        return np.stack([r, g, b], axis=-1) * 255

    def visualize(self, image_rgb: np.ndarray, outputs: Dict[str, np.ndarray],
                  image_index: int = 0) -> np.ndarray:
        """outputs: batched inference dict with boxes/scores/valid +
        dp_patch/dp_u/dp_v. Returns the painted uint8 image."""
        img = np.asarray(image_rgb, np.float32).copy()
        h, w = img.shape[:2]
        i = image_index
        valid = np.asarray(outputs["valid"][i])
        scores = np.asarray(outputs["scores"][i])
        boxes = np.asarray(outputs["boxes"][i])
        patches = np.asarray(outputs["dp_patch"][i])
        us = np.asarray(outputs.get("dp_u", np.zeros_like(patches, np.float32))[i]
                        if "dp_u" in outputs else np.zeros_like(patches, np.float32))
        vs = np.asarray(outputs.get("dp_v", np.zeros_like(patches, np.float32))[i]
                        if "dp_v" in outputs else np.zeros_like(patches, np.float32))

        order = np.argsort(scores)  # paint best last
        for j in order:
            if not valid[j] or scores[j] < self.score_thresh:
                continue
            x0, y0, x1, y1 = boxes[j]
            x0, y0 = max(int(x0), 0), max(int(y0), 0)
            x1, y1 = min(int(np.ceil(x1)), w), min(int(np.ceil(y1)), h)
            bw, bh = x1 - x0, y1 - y0
            if bw <= 0 or bh <= 0:
                continue
            patch = _resize_nearest(patches[j], bh, bw)
            vals = _resize_nearest(
                us[j] if self.mode == "u" else vs[j], bh, bw
            )
            rgb = self._chart_to_rgb(patch, vals)
            mask = patch > 0
            region = img[y0:y1, x0:x1]
            region[mask] = (
                (1 - self.alpha) * region[mask] + self.alpha * rgb[mask]
            )
            img[y0:y1, x0:x1] = region
        return np.clip(img, 0, 255).astype(np.uint8)


def _resize_nearest(a: np.ndarray, h: int, w: int) -> np.ndarray:
    sh, sw = a.shape[:2]
    ys = np.minimum((np.arange(h) * sh // max(h, 1)), sh - 1)
    xs = np.minimum((np.arange(w) * sw // max(w, 1)), sw - 1)
    return a[ys[:, None], xs[None, :]]


class DensePoseOutputsExtractor:
    """Pulls the dp chart fields for one image out of a batched output dict
    (reference vis/extractor.py)."""

    def __call__(self, outputs: Dict[str, np.ndarray], image_index: int = 0):
        valid = np.asarray(outputs["valid"][image_index])
        return {
            "boxes": np.asarray(outputs["boxes"][image_index])[valid],
            "scores": np.asarray(outputs["scores"][image_index])[valid],
            "dp_patch": np.asarray(outputs["dp_patch"][image_index])[valid],
            "dp_u": np.asarray(outputs["dp_u"][image_index])[valid],
            "dp_v": np.asarray(outputs["dp_v"][image_index])[valid],
        }

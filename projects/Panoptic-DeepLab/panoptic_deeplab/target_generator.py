"""Training target generation (reference:
projects/Panoptic-DeepLab/panoptic_deeplab/target_generator.py): gaussian
center heatmaps + per-pixel offsets to the instance center. Host-side."""

from __future__ import annotations

from typing import Dict

import numpy as np


def panoptic_deeplab_targets(
    instance_masks: np.ndarray,  # (G, H, W) bool
    valid: np.ndarray,  # (G,)
    sigma: float = 8.0,
) -> Dict[str, np.ndarray]:
    g, h, w = instance_masks.shape
    center = np.zeros((h, w), np.float32)
    offset = np.zeros((h, w, 2), np.float32)
    weight = np.zeros((h, w), np.float32)

    ys, xs = np.mgrid[0:h, 0:w]
    size = int(6 * sigma + 3)
    gx = np.arange(size) - (size - 1) / 2
    gauss = np.exp(-(gx[:, None] ** 2 + gx[None, :] ** 2) / (2 * sigma**2))

    for i in range(g):
        if not valid[i]:
            continue
        mask = instance_masks[i]
        if mask.sum() == 0:
            continue
        cy, cx = ys[mask].mean(), xs[mask].mean()
        # paint the gaussian
        x0 = int(round(cx)) - size // 2
        y0 = int(round(cy)) - size // 2
        sx0, sy0 = max(0, -x0), max(0, -y0)
        dx0, dy0 = max(0, x0), max(0, y0)
        dx1, dy1 = min(w, x0 + size), min(h, y0 + size)
        if dx1 > dx0 and dy1 > dy0:
            center[dy0:dy1, dx0:dx1] = np.maximum(
                center[dy0:dy1, dx0:dx1],
                gauss[sy0 : sy0 + dy1 - dy0, sx0 : sx0 + dx1 - dx0],
            )
        offset[mask, 0] = cy - ys[mask]
        offset[mask, 1] = cx - xs[mask]
        weight[mask] = 1.0
    return {"gt_center": center, "gt_offset": offset, "gt_offset_weight": weight}

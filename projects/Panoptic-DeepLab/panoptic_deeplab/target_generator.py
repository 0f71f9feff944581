"""Training target generation (reference:
projects/Panoptic-DeepLab/panoptic_deeplab/target_generator.py
``PanopticDeepLabTargetGenerator``): gaussian center heatmaps, per-pixel
offsets to the instance center, offset-loss weights (things only when
``ignore_stuff_in_offset``) and semantic-loss weights (small instances
up-weighted by ``small_instance_weight``). Host-side numpy."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def panoptic_deeplab_targets(
    instance_masks: np.ndarray,  # (G, H, W) bool
    valid: np.ndarray,  # (G,)
    sigma: float = 8.0,
    sem_seg: Optional[np.ndarray] = None,  # (H, W) int labels (for weights)
    ignore_label: int = 255,
    ignore_stuff_in_offset: bool = True,
    small_instance_area: int = 0,
    small_instance_weight: float = 1.0,
) -> Dict[str, np.ndarray]:
    g, h, w = instance_masks.shape
    center = np.zeros((h, w), np.float32)
    offset = np.zeros((h, w, 2), np.float32)
    thing_region = np.zeros((h, w), bool)
    sem_weight = np.ones((h, w), np.float32)

    ys, xs = np.mgrid[0:h, 0:w]
    size = int(6 * sigma + 3)
    gx = np.arange(size) - (size - 1) / 2
    gauss = np.exp(-(gx[:, None] ** 2 + gx[None, :] ** 2) / (2 * sigma**2))

    for i in range(g):
        if not valid[i]:
            continue
        mask = instance_masks[i]
        area = int(mask.sum())
        if area == 0:
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
        thing_region |= mask
        if small_instance_area > 0 and area < small_instance_area:
            sem_weight[mask] = small_instance_weight

    if ignore_stuff_in_offset or sem_seg is None:
        offset_weight = thing_region.astype(np.float32)
    else:
        offset_weight = (sem_seg != ignore_label).astype(np.float32)
    if sem_seg is not None:
        sem_weight = np.where(sem_seg != ignore_label, sem_weight, 0.0).astype(
            np.float32
        )
    return {
        "gt_center": center,
        "gt_offset": offset,
        "gt_offset_weight": offset_weight,
        "gt_sem_weight": sem_weight,
    }

"""Center-NMS instance grouping -> panoptic map (reference:
projects/Panoptic-DeepLab/panoptic_deeplab/post_processing.py). Host-side
numpy; runs once per image at eval."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def find_instance_centers(
    center_heatmap: np.ndarray, threshold: float = 0.1, nms_kernel: int = 7, top_k: int = 200
) -> np.ndarray:
    """(H, W) -> (K, 2) (y, x) of local maxima above threshold."""
    h, w = center_heatmap.shape
    pad = nms_kernel // 2
    padded = np.pad(center_heatmap, pad, constant_values=-np.inf)
    # max-pool via strided windows
    from numpy.lib.stride_tricks import sliding_window_view

    windows = sliding_window_view(padded, (nms_kernel, nms_kernel))
    pooled = windows.max(axis=(2, 3))
    is_peak = (center_heatmap == pooled) & (center_heatmap > threshold)
    ys, xs = np.nonzero(is_peak)
    scores = center_heatmap[ys, xs]
    order = np.argsort(-scores)[:top_k]
    return np.stack([ys[order], xs[order]], axis=1) if len(order) else np.zeros((0, 2), int)


def group_pixels(centers: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Assign each pixel to its nearest (pixel + offset) center -> (H, W) ids
    starting at 1; 0 if no centers."""
    h, w = offsets.shape[:2]
    if len(centers) == 0:
        return np.zeros((h, w), np.int32)
    ys, xs = np.mgrid[0:h, 0:w]
    loc = np.stack([ys + offsets[..., 0], xs + offsets[..., 1]], axis=-1)  # (H, W, 2)
    d = np.linalg.norm(loc[:, :, None, :] - centers[None, None, :, :], axis=-1)
    return (np.argmin(d, axis=-1) + 1).astype(np.int32)


def get_panoptic_segmentation(
    sem_seg: np.ndarray,  # (H, W) class ids
    center_heatmap: np.ndarray,  # (H, W)
    offsets: np.ndarray,  # (H, W, 2)
    thing_ids: set,
    label_divisor: int = 1000,
    stuff_area: int = 2048,
    void_label: int = 0,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
) -> Tuple[np.ndarray, List[dict]]:
    centers = find_instance_centers(center_heatmap, threshold, nms_kernel, top_k)
    instance_ids = group_pixels(centers, offsets)
    thing_mask = np.isin(sem_seg, list(thing_ids))

    panoptic = np.zeros_like(sem_seg, dtype=np.int32)
    segments: List[dict] = []
    # things: majority class per instance
    for inst_id in range(1, instance_ids.max() + 1 if len(centers) else 0):
        mask = (instance_ids == inst_id) & thing_mask
        if mask.sum() == 0:
            continue
        cls = np.bincount(sem_seg[mask]).argmax()
        pid = int(cls) * label_divisor + inst_id
        panoptic[mask] = pid
        segments.append({"id": pid, "category_id": int(cls), "isthing": True})
    # stuff
    for cls in np.unique(sem_seg):
        if cls in thing_ids:
            continue
        mask = (sem_seg == cls) & (panoptic == 0)
        if mask.sum() < stuff_area:
            continue
        pid = int(cls) * label_divisor
        if pid == 0:
            pid = label_divisor * (sem_seg.max() + 1)
        panoptic[mask] = pid
        segments.append({"id": pid, "category_id": int(cls), "isthing": False})
    return panoptic, segments

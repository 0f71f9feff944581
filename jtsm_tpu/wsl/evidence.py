"""Host-side object evidence: GrabCut + polygonization.

Reference: roi_heads_jtsm.py:1820 (``get_grabcut_process`` — a 20-process
multiprocessing.Pool running cv2.grabCut per mined box), :133
(``do_grabcut``), :100 (``binary_mask_to_polygon``). These are CPU ops in
the reference too; here they run on the host between training steps when
enabled (the in-graph path uses superpixel-union evidence instead — see
roi_heads_jtsm.superpixel_union_mask_crop).
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def do_grabcut(image_bgr: np.ndarray, box_xyxy: np.ndarray, iters: int = 5) -> np.ndarray:
    """Run GrabCut seeded with the box; returns a bool mask of the fg
    (reference do_grabcut :133)."""
    import cv2

    h, w = image_bgr.shape[:2]
    x0, y0, x1, y1 = [int(round(float(v))) for v in box_xyxy]
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, w), min(y1, h)
    if x1 - x0 < 2 or y1 - y0 < 2:
        return np.zeros((h, w), bool)
    mask = np.zeros((h, w), np.uint8)
    bgd_model = np.zeros((1, 65), np.float64)
    fgd_model = np.zeros((1, 65), np.float64)
    rect = (x0, y0, x1 - x0, y1 - y0)
    try:
        cv2.grabCut(
            np.ascontiguousarray(image_bgr.astype(np.uint8)),
            mask,
            rect,
            bgd_model,
            fgd_model,
            iters,
            cv2.GC_INIT_WITH_RECT,
        )
    except cv2.error as e:
        logger.warning(f"grabCut failed: {e}")
        out = np.zeros((h, w), bool)
        out[y0:y1, x0:x1] = True
        return out
    return (mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)


def grabcut_evidence_batch(
    images_bgr: np.ndarray,  # (B, H, W, 3)
    boxes: np.ndarray,  # (B, N, 4)
    valid: np.ndarray,  # (B, N)
    mask_size: int = 28,
) -> np.ndarray:
    """(B, N, mask_size, mask_size) bool crops of GrabCut fg evidence."""
    b, n = boxes.shape[:2]
    out = np.zeros((b, n, mask_size, mask_size), bool)
    for i in range(b):
        for j in range(n):
            if not valid[i, j]:
                continue
            full = do_grabcut(images_bgr[i], boxes[i, j])
            x0, y0, x1, y1 = boxes[i, j]
            ys = np.clip(
                np.linspace(y0, y1, mask_size, endpoint=False).astype(int), 0, full.shape[0] - 1
            )
            xs = np.clip(
                np.linspace(x0, x1, mask_size, endpoint=False).astype(int), 0, full.shape[1] - 1
            )
            out[i, j] = full[ys[:, None], xs[None, :]]
    return out


def binary_mask_to_polygon(mask: np.ndarray, tolerance: float = 0.5) -> List[np.ndarray]:
    """Mask -> polygon list via cv2 contours (reference :100)."""
    import cv2

    mask = np.ascontiguousarray(mask.astype(np.uint8))
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    polygons = []
    for c in contours:
        c = cv2.approxPolyDP(c, tolerance, True)
        if len(c) >= 3:
            polygons.append(c.reshape(-1).astype(np.float64))
    return polygons

"""DensePose output converters (reference:
projects/DensePose/densepose/converters/ — to_chart_result.py
``ToChartResultConverter``, segm_to_mask.py ``ToMaskConverter`` /
``resample_fine_and_coarse_segm_to_bbox``, chart_output_hflip.py
``densepose_chart_predictor_output_hflip``).

Host-side numpy post-processing of the batched inference dict produced by
``DensePoseROIHeads._forward_extra_inference`` (dp_patch/dp_u/dp_v maps in
box-normalized space). The TPU already collapsed fine/coarse segmentation
into the dp_patch argmax map, so "resampling segm to bbox" is a resize of
that label map.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# 24 DensePose parts: left<->right swaps under horizontal flip
# (reference DensePoseTransformData semantics; pairs from the SMPL chart
# layout used by densepose_coco: torso 1/2 self-symmetric, hands 3<->4,
# feet 5<->6, legs/arms paired)
DP_HFLIP_PART_SWAP = {
    1: 1, 2: 2, 3: 4, 4: 3, 5: 6, 6: 5,
    7: 9, 8: 10, 9: 7, 10: 8, 11: 13, 12: 14, 13: 11, 14: 12,
    15: 17, 16: 18, 17: 15, 18: 16, 19: 21, 20: 22, 21: 19, 22: 20,
    23: 24, 24: 23,
}


def _resize_bilinear(a: np.ndarray, h: int, w: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(a.astype(np.float32), (w, h), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        sh, sw = a.shape[:2]
        ys = np.minimum((np.arange(h) * sh // max(h, 1)), sh - 1)
        xs = np.minimum((np.arange(w) * sw // max(w, 1)), sw - 1)
        return a[ys[:, None], xs[None, :]].astype(np.float32)


def _resize_nearest(a: np.ndarray, h: int, w: int) -> np.ndarray:
    sh, sw = a.shape[:2]
    ys = np.minimum((np.arange(h) * sh // max(h, 1)), sh - 1)
    xs = np.minimum((np.arange(w) * sw // max(w, 1)), sw - 1)
    return a[ys[:, None], xs[None, :]]


def resample_fine_and_coarse_segm_to_bbox(
    dp_patch: np.ndarray, box_xywh: Tuple[int, int, int, int]
) -> np.ndarray:
    """Part-label map resampled to the bbox (reference segm_to_mask.py:12).
    dp_patch (S, S) int -> (h, w) uint8."""
    x, y, w, h = box_xywh
    w, h = max(int(w), 1), max(int(h), 1)
    return _resize_nearest(dp_patch, h, w).astype(np.uint8)


def resample_uv_to_bbox(
    dp_u: np.ndarray, dp_v: np.ndarray, labels: np.ndarray,
    box_xywh: Tuple[int, int, int, int],
) -> np.ndarray:
    """U/V maps resampled to the bbox, zeroed on background (reference
    chart_output_to_chart_result.py:17). Returns (2, h, w) float32."""
    x, y, w, h = box_xywh
    w, h = max(int(w), 1), max(int(h), 1)
    u = _resize_bilinear(dp_u, h, w)
    v = _resize_bilinear(dp_v, h, w)
    fg = labels > 0
    return np.stack([np.where(fg, u, 0.0), np.where(fg, v, 0.0)], axis=0)


class ToChartResultConverter:
    """detections dict + index -> per-detection chart results (reference
    converters/to_chart_result.py:11)."""

    @classmethod
    def convert(cls, outputs: Dict[str, np.ndarray], image_index: int = 0):
        valid = np.asarray(outputs["valid"][image_index])
        boxes = np.asarray(outputs["boxes"][image_index])
        results = []
        for j in np.nonzero(valid)[0]:
            x0, y0, x1, y1 = boxes[j]
            box_xywh = (int(x0), int(y0), int(np.ceil(x1 - x0)), int(np.ceil(y1 - y0)))
            labels = resample_fine_and_coarse_segm_to_bbox(
                np.asarray(outputs["dp_patch"][image_index][j]), box_xywh
            )
            uv = resample_uv_to_bbox(
                np.asarray(outputs["dp_u"][image_index][j]),
                np.asarray(outputs["dp_v"][image_index][j]),
                labels,
                box_xywh,
            )
            result = {"labels": labels, "uv": uv, "box_xywh": box_xywh}
            if "dp_sigma" in outputs:
                result["sigma_2"] = _resize_bilinear(
                    np.asarray(outputs["dp_sigma"][image_index][j]),
                    box_xywh[3],
                    box_xywh[2],
                )
            results.append(result)
        return results


class ToMaskConverter:
    """detections -> per-detection boolean masks in image space (reference
    converters/to_mask.py:12)."""

    @classmethod
    def convert(
        cls,
        outputs: Dict[str, np.ndarray],
        image_index: int,
        image_hw: Tuple[int, int],
    ) -> np.ndarray:
        h, w = image_hw
        valid = np.asarray(outputs["valid"][image_index])
        boxes = np.asarray(outputs["boxes"][image_index])
        patches = np.asarray(outputs["dp_patch"][image_index])
        masks = np.zeros((int(valid.sum()), h, w), dtype=bool)
        for out_i, j in enumerate(np.nonzero(valid)[0]):
            x0, y0, x1, y1 = boxes[j]
            x0i, y0i = max(int(x0), 0), max(int(y0), 0)
            x1i, y1i = min(int(np.ceil(x1)), w), min(int(np.ceil(y1)), h)
            if x1i <= x0i or y1i <= y0i:
                continue
            lab = _resize_nearest(patches[j], y1i - y0i, x1i - x0i)
            masks[out_i, y0i:y1i, x0i:x1i] = lab > 0
        return masks


def densepose_chart_predictor_output_hflip(
    outputs: Dict[str, np.ndarray],
    uv_symmetries: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Horizontally flip chart outputs (reference chart_output_hflip.py:9):
    spatially mirror the maps, swap left/right part labels, and (when the
    DensePose UV-symmetry tables are provided) remap U/V values.

    uv_symmetries: optional dict with "U_transforms"/"V_transforms", each
    (24, 256) lookup tables from the DensePose release; without them only
    the spatial+label flip is applied (exact for segm, approximate for UV).
    """
    out = dict(outputs)
    patch = np.asarray(outputs["dp_patch"])[..., ::-1]
    # label swap
    lut = np.arange(25)
    for a, b in DP_HFLIP_PART_SWAP.items():
        lut[a] = b
    patch = lut[patch]
    out["dp_patch"] = patch
    u = np.asarray(outputs["dp_u"])[..., ::-1]
    v = np.asarray(outputs["dp_v"])[..., ::-1]
    if uv_symmetries is not None:
        ut = uv_symmetries["U_transforms"]  # (24, 256)
        vt = uv_symmetries["V_transforms"]
        bins_u = np.clip((u * 255).astype(np.int32), 0, 255)
        bins_v = np.clip((v * 255).astype(np.int32), 0, 255)
        pidx = np.clip(patch - 1, 0, 23)
        fg = patch > 0
        u = np.where(fg, ut[pidx, bins_u], u)
        v = np.where(fg, vt[pidx, bins_v], v)
    out["dp_u"] = u
    out["dp_v"] = v
    if "dp_sigma" in outputs:
        out["dp_sigma"] = np.asarray(outputs["dp_sigma"])[..., ::-1]
    return out


class HFlipConverter:
    """Reference converters/hflip.py:8."""

    @classmethod
    def convert(cls, outputs, uv_symmetries=None):
        return densepose_chart_predictor_output_hflip(outputs, uv_symmetries)

"""DensePose evaluation (reference:
projects/DensePose/densepose/densepose_coco_evaluation.py, 1176 LoC — GPS /
GPSm metrics).

GPS (geodesic point similarity): for each matched detection/gt pair, compare
predicted (I, U, V) at the gt's annotated points; similarity =
exp(-g^2 / (2 k^2)) with g the geodesic distance between predicted and true
surface points. Geodesic distances require the SMPL mesh tables (not
redistributable); this implementation substitutes the standard within-patch
UV euclidean approximation (exact when patches match, distance 1 otherwise)
and reports AP under the COCO protocol with GPS as the match score.
"""

from __future__ import annotations

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List

import numpy as np

from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from jtsm_tpu.utils import comm
from jtsm_tpu.evaluation.evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


def gps_similarity(
    pred_patch: np.ndarray,  # (P,) predicted patch index at gt points
    pred_u: np.ndarray,
    pred_v: np.ndarray,
    gt_patch: np.ndarray,
    gt_u: np.ndarray,
    gt_v: np.ndarray,
    valid: np.ndarray,
    kappa: float = 0.255,
) -> float:
    """Mean point similarity for one instance."""
    if valid.sum() == 0:
        return 0.0
    same = (pred_patch == gt_patch) & valid
    d = np.sqrt((pred_u - gt_u) ** 2 + (pred_v - gt_v) ** 2)
    dist = np.where(same, d, 1.0)  # cross-patch => max distance
    sim = np.exp(-(dist**2) / (2 * kappa**2))
    return float(np.sum(sim * valid) / np.maximum(valid.sum(), 1))


class DensePoseCOCOEvaluator(DatasetEvaluator):
    """Matches predictions to gt person boxes (IoU > 0.5 greedy) and
    computes AP over GPS thresholds 0.5:0.05:0.95.

    eval_mode 'gps' scores matches by point similarity alone; 'gpsm'
    (reference densepose_coco_evaluation.py:738) geometric-means GPS with
    the mask IoU between the predicted fg chart and the gt box mask:
    sqrt(gps * mask_iou)."""

    def __init__(self, dataset_name: str, eval_mode: str = "gps"):
        assert eval_mode in ("gps", "gpsm"), eval_mode
        self._eval_mode = eval_mode
        self._dataset_name = dataset_name
        dicts = DatasetCatalog.get(dataset_name)
        self._gt = {}
        for d in dicts:
            self._gt[d["image_id"]] = d.get("annotations", [])
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        """outputs must carry per-detection densepose dicts under
        'densepose': list (B) of lists of {box, patch_map, u_map, v_map}."""
        b = len(outputs.get("densepose", []))
        for i in range(b):
            self._predictions.append(
                {
                    "image_id": int(inputs["image_ids"][i]),
                    "dets": outputs["densepose"][i],
                }
            )

    def evaluate(self):
        comm.synchronize()
        preds = list(itertools.chain(*comm.gather(self._predictions, dst=0)))
        if not comm.is_main_process():
            return {}
        if not preds:
            return {}
        sims: List[float] = []
        n_gt = 0
        from jtsm_tpu.evaluation.coco_evaluation import _iou_np

        for p in preds:
            annos = [a for a in self._gt.get(p["image_id"], []) if "dp_x" in a]
            n_gt += len(annos)
            if not annos or not p["dets"]:
                continue
            gt_boxes = np.asarray([a["bbox"] for a in annos], np.float64)
            gt_xyxy = gt_boxes.copy()
            gt_xyxy[:, 2:] += gt_xyxy[:, :2]
            det_boxes = np.asarray([d["box"] for d in p["dets"]], np.float64)
            iou = _iou_np(det_boxes, gt_xyxy)
            used = set()
            for di in np.argsort([-d.get("score", 1.0) for d in p["dets"]]):
                gi = int(iou[di].argmax()) if iou.shape[1] else -1
                if gi < 0 or iou[di, gi] < 0.5 or gi in used:
                    continue
                used.add(gi)
                a = annos[gi]
                det = p["dets"][di]
                # sample predicted maps at gt points (normalized box coords)
                xs = np.clip(
                    (np.asarray(a["dp_x"]) / 256.0 * (det["u_map"].shape[1] - 1)).astype(int),
                    0,
                    det["u_map"].shape[1] - 1,
                )
                ys = np.clip(
                    (np.asarray(a["dp_y"]) / 256.0 * (det["u_map"].shape[0] - 1)).astype(int),
                    0,
                    det["u_map"].shape[0] - 1,
                )
                gps = gps_similarity(
                    det["patch_map"][ys, xs],
                    det["u_map"][ys, xs],
                    det["v_map"][ys, xs],
                    np.asarray(a["dp_I"]),
                    np.asarray(a["dp_U"]),
                    np.asarray(a["dp_V"]),
                    np.ones(len(xs), bool),
                )
                if self._eval_mode == "gpsm":
                    # mask IoU between predicted fg chart and gt dp mask
                    # (gt mask rasterized from dp points when no dp_masks)
                    pred_fg = det["patch_map"] > 0
                    hM, wM = pred_fg.shape
                    gt_fg = np.zeros_like(pred_fg)
                    gxs = np.clip(
                        (np.asarray(a["dp_x"]) / 256.0 * (wM - 1)).astype(int), 0, wM - 1
                    )
                    gys = np.clip(
                        (np.asarray(a["dp_y"]) / 256.0 * (hM - 1)).astype(int), 0, hM - 1
                    )
                    gt_fg[gys, gxs] = True
                    inter = np.logical_and(pred_fg, gt_fg).sum()
                    union = np.logical_or(pred_fg, gt_fg).sum()
                    mask_iou = inter / max(union, 1)
                    gps = float(np.sqrt(gps * mask_iou))
                sims.append(gps)
        sims_arr = np.asarray(sims)
        thresholds = np.linspace(0.5, 0.95, 10)
        recalls = [(sims_arr >= t).sum() / max(n_gt, 1) for t in thresholds]
        ap = float(np.mean(recalls)) * 100
        ret = OrderedDict({"densepose": {"AP": ap, "mean_GPS": float(sims_arr.mean()) if len(sims_arr) else 0.0}})
        logger.info(ret)
        return ret

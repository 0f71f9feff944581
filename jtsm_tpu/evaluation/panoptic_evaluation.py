"""Panoptic Quality evaluation (reference:
detectron2/evaluation/panoptic_evaluation.py:23 ``COCOPanopticEvaluator`` —
which defers to panopticapi's pq_compute; absent here, so PQ is implemented
from scratch: segments of equal category match at IoU > 0.5; per class
PQ = sum IoU / (TP + FP/2 + FN/2), SQ = sum IoU / TP, RQ = TP/(TP+FP/2+FN/2).
"""

from __future__ import annotations

import itertools
import json
import logging
import os
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from ..data.catalog import MetadataCatalog
from ..utils import comm
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

VOID = 0
OFFSET = 256 * 256 * 256


def rgb2id(color: np.ndarray) -> np.ndarray:
    """panopticapi convention: id = R + G*256 + B*256^2."""
    color = color.astype(np.uint32)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    out = np.zeros(id_map.shape + (3,), dtype=np.uint8)
    out[..., 0] = id_map % 256
    out[..., 1] = (id_map // 256) % 256
    out[..., 2] = (id_map // (256 * 256)) % 256
    return out


class PQStat:
    def __init__(self):
        self.per_cat = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})

    def __iadd__(self, other: "PQStat"):
        for k, v in other.per_cat.items():
            s = self.per_cat[k]
            for f in ("iou", "tp", "fp", "fn"):
                s[f] += v[f]
        return self

    def pq_average(self, categories: Dict[int, dict], isthing: Optional[bool] = None):
        pq, sq, rq, n = 0.0, 0.0, 0.0, 0
        for cat_id, cat in categories.items():
            if isthing is not None and bool(cat["isthing"]) != isthing:
                continue
            s = self.per_cat[cat_id]
            tp, fp, fn = s["tp"], s["fp"], s["fn"]
            if tp + fp + fn == 0:
                continue
            n += 1
            pq_c = s["iou"] / (tp + 0.5 * fp + 0.5 * fn)
            sq_c = s["iou"] / tp if tp != 0 else 0.0
            rq_c = tp / (tp + 0.5 * fp + 0.5 * fn)
            pq += pq_c
            sq += sq_c
            rq += rq_c
        if n == 0:
            return {"pq": 0.0, "sq": 0.0, "rq": 0.0, "n": 0}
        return {"pq": pq / n, "sq": sq / n, "rq": rq / n, "n": n}


def pq_compute_single_image(
    pan_gt: np.ndarray,
    pan_pred: np.ndarray,
    gt_segments: List[dict],
    pred_segments: List[dict],
) -> PQStat:
    """pan_*: (H, W) int32 segment-id maps; segments: [{id, category_id,
    iscrowd?, area?}]."""
    stat = PQStat()
    gt_info = {s["id"]: s for s in gt_segments}
    pred_info = {s["id"]: s for s in pred_segments}

    # areas
    gt_ids, gt_areas = np.unique(pan_gt, return_counts=True)
    pred_ids, pred_areas = np.unique(pan_pred, return_counts=True)
    gt_area_map = dict(zip(gt_ids.tolist(), gt_areas.tolist()))
    pred_area_map = dict(zip(pred_ids.tolist(), pred_areas.tolist()))

    # intersections
    combined = pan_gt.astype(np.uint64) * OFFSET + pan_pred.astype(np.uint64)
    combo_ids, combo_areas = np.unique(combined, return_counts=True)
    inter = {}
    for cid, area in zip(combo_ids.tolist(), combo_areas.tolist()):
        gt_id = cid // OFFSET
        pred_id = cid % OFFSET
        inter[(gt_id, pred_id)] = area

    matched_gt = set()
    matched_pred = set()
    for (gt_id, pred_id), intersection in inter.items():
        if gt_id not in gt_info or pred_id not in pred_info:
            continue
        g = gt_info[gt_id]
        p = pred_info[pred_id]
        if g.get("iscrowd", 0) == 1:
            continue
        if g["category_id"] != p["category_id"]:
            continue
        union = (
            gt_area_map.get(gt_id, 0)
            + pred_area_map.get(pred_id, 0)
            - intersection
            - inter.get((VOID, pred_id), 0)
        )
        iou = intersection / union if union > 0 else 0.0
        if iou > 0.5:
            s = stat.per_cat[g["category_id"]]
            s["tp"] += 1
            s["iou"] += iou
            matched_gt.add(gt_id)
            matched_pred.add(pred_id)

    # false negatives
    crowd_by_cat = {}
    for gt_id, g in gt_info.items():
        if gt_id in matched_gt:
            continue
        if g.get("iscrowd", 0) == 1:
            crowd_by_cat[g["category_id"]] = gt_id
            continue
        stat.per_cat[g["category_id"]]["fn"] += 1

    # false positives (ignore mostly-void / crowd-covered predictions)
    for pred_id, p in pred_info.items():
        if pred_id in matched_pred:
            continue
        intersection = inter.get((VOID, pred_id), 0)
        if p["category_id"] in crowd_by_cat:
            intersection += inter.get((crowd_by_cat[p["category_id"]], pred_id), 0)
        if intersection / max(pred_area_map.get(pred_id, 1), 1) > 0.5:
            continue
        stat.per_cat[p["category_id"]]["fp"] += 1
    return stat


class COCOPanopticEvaluator(DatasetEvaluator):
    """Consumes per-image predicted panoptic id-maps + segment info."""

    def __init__(self, dataset_name: str, output_dir: Optional[str] = None):
        self._metadata = MetadataCatalog.get(dataset_name)
        self._output_dir = output_dir
        self._thing_map = self._metadata.get("thing_dataset_id_to_contiguous_id", {})
        self._stuff_map = self._metadata.get("stuff_dataset_id_to_contiguous_id", {})
        self._thing_reverse = {v: k for k, v in self._thing_map.items()}
        self._stuff_reverse = {v: k for k, v in self._stuff_map.items()}
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def _convert_category_id(self, segment_info: dict) -> dict:
        if segment_info.get("isthing") is True:
            segment_info = dict(segment_info)
            segment_info["category_id"] = self._thing_reverse[segment_info["category_id"]]
        elif segment_info.get("isthing") is False:
            segment_info = dict(segment_info)
            segment_info["category_id"] = self._stuff_reverse[segment_info["category_id"]]
        return segment_info

    def process(self, inputs, outputs):
        """outputs['panoptic_seg']: list of (id_map np.ndarray, segments)."""
        for i, (panoptic_img, segments_info) in enumerate(outputs["panoptic_seg"]):
            segments_info = [self._convert_category_id(s) for s in segments_info]
            self._predictions.append(
                {
                    "image_id": int(inputs["image_ids"][i]),
                    "id_map": np.asarray(panoptic_img),
                    "segments_info": segments_info,
                }
            )

    def evaluate(self):
        comm.synchronize()
        self._predictions = comm.gather(self._predictions)
        self._predictions = list(itertools.chain(*self._predictions))
        if not comm.is_main_process():
            return {}

        gt_json = self._metadata.panoptic_json
        gt_root = self._metadata.panoptic_root
        with open(gt_json) as f:
            gt = json.load(f)
        gt_by_image = {a["image_id"]: a for a in gt["annotations"]}
        categories = {c["id"]: c for c in gt["categories"]}

        stat = PQStat()
        for pred in self._predictions:
            ann = gt_by_image.get(pred["image_id"])
            if ann is None:
                continue
            gt_pan = rgb2id(
                np.asarray(Image.open(os.path.join(gt_root, ann["file_name"])))
            )
            stat += pq_compute_single_image(
                gt_pan, pred["id_map"], ann["segments_info"], pred["segments_info"]
            )

        res = {}
        all_metrics = stat.pq_average(categories)
        things = stat.pq_average(categories, isthing=True)
        stuff = stat.pq_average(categories, isthing=False)
        res["PQ"] = 100 * all_metrics["pq"]
        res["SQ"] = 100 * all_metrics["sq"]
        res["RQ"] = 100 * all_metrics["rq"]
        res["PQ_th"] = 100 * things["pq"]
        res["SQ_th"] = 100 * things["sq"]
        res["RQ_th"] = 100 * things["rq"]
        res["PQ_st"] = 100 * stuff["pq"]
        res["SQ_st"] = 100 * stuff["sq"]
        res["RQ_st"] = 100 * stuff["rq"]
        results = OrderedDict({"panoptic_seg": res})
        logger.info(results)
        return results

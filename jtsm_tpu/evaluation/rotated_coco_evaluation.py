"""COCO-style AP evaluation for rotated (XYWHA) boxes.

Reference: detectron2/evaluation/rotated_coco_evaluation.py — a COCOeval
subclass whose IoU kernel is exact rotated-polygon intersection
(``pairwise_iou_rotated``), plus an evaluator that converts 4-dim XYWH
annotations / predictions to 5-dim XYWHA on the fly. Crowd GT is not
supported for rotated boxes (same restriction as the reference, :60).

Host-side: matching runs on CPU after inference, so the IoU here is plain
numpy polygon clipping (Sutherland–Hodgman), not the jitted JAX kernel in
``structures/rotated_boxes.py``.
"""

from __future__ import annotations

import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from ..data.catalog import MetadataCatalog
from ..utils import comm
from .cocoeval import COCOEval
from .coco_evaluation import COCOEvaluator

logger = logging.getLogger(__name__)


def rotated_box_corners_np(boxes: np.ndarray) -> np.ndarray:
    """(N, 5) XYWHA (angle in degrees, CCW) -> (N, 4, 2) corners."""
    cx, cy, w, h, a = [boxes[:, i] for i in range(5)]
    theta = a * np.pi / 180.0
    c, s = np.cos(theta), np.sin(theta)
    # corner offsets in box frame, CCW
    dx = np.stack([w / 2, w / 2, -w / 2, -w / 2], axis=1)
    dy = np.stack([-h / 2, h / 2, h / 2, -h / 2], axis=1)
    x = cx[:, None] + dx * c[:, None] - dy * s[:, None]
    y = cy[:, None] + dx * s[:, None] + dy * c[:, None]
    return np.stack([x, y], axis=2)


def _cross2(a: np.ndarray, b: np.ndarray) -> float:
    # z-component of the 2-D cross product (np.cross on 2-D vectors is
    # deprecated since NumPy 2.0)
    return a[0] * b[1] - a[1] * b[0]


def _polygon_clip(subject: List[np.ndarray], clip: np.ndarray) -> List[np.ndarray]:
    """Sutherland–Hodgman: clip a convex polygon by another convex polygon."""
    out = subject
    n = len(clip)
    for i in range(n):
        p0, p1 = clip[i], clip[(i + 1) % n]
        edge = p1 - p0
        inp, out = out, []
        if not inp:
            break
        prev = inp[-1]
        prev_in = _cross2(edge, prev - p0) >= 0
        for cur in inp:
            cur_in = _cross2(edge, cur - p0) >= 0
            if cur_in != prev_in:
                # intersection of segment prev->cur with the clip edge line
                d = cur - prev
                denom = _cross2(edge, d)
                if abs(denom) > 1e-12:
                    t = _cross2(edge, p0 - prev) / denom
                    out.append(prev + t * d)
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
    return out


def _poly_area(pts: List[np.ndarray]) -> float:
    if len(pts) < 3:
        return 0.0
    p = np.asarray(pts)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def pairwise_iou_rotated_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """(N, 5) x (M, 5) XYWHA -> (N, M) exact IoU (host numpy)."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    out = np.zeros((n, m))
    if n == 0 or m == 0:
        return out
    c1 = rotated_box_corners_np(boxes1.astype(np.float64))
    c2 = rotated_box_corners_np(boxes2.astype(np.float64))
    a1 = np.abs(boxes1[:, 2] * boxes1[:, 3])
    a2 = np.abs(boxes2[:, 2] * boxes2[:, 3])
    for i in range(n):
        for j in range(m):
            inter = _poly_area(_polygon_clip(list(c1[i]), c2[j]))
            union = a1[i] + a2[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _to_xywha(box) -> List[float]:
    box = list(map(float, box))
    if len(box) == 5:
        return box
    assert len(box) == 4, box
    x, y, w, h = box
    return [x + w / 2, y + h / 2, w, h, 0.0]


class RotatedCOCOEval(COCOEval):
    """COCOEval whose bbox IoU is exact rotated IoU (reference :15).

    GT/detections may mix 4-dim XYWH and 5-dim XYWHA; 4-dim entries are
    treated as angle-0 rotated boxes. Crowd GT is rejected (reference :60).
    """

    def _compute_iou(self, dets, gts, img_id):
        assert self.iou_type == "bbox", "rotated eval supports iouType='bbox' only"
        assert all(not g.get("iscrowd", 0) for g in gts), (
            "crowd GT is not supported with rotated boxes"
        )
        d = np.asarray([_to_xywha(det["bbox"]) for det in dets], np.float64).reshape(-1, 5)
        g = np.asarray([_to_xywha(gt["bbox"]) for gt in gts], np.float64).reshape(-1, 5)
        return pairwise_iou_rotated_np(d, g)

    def _det_area(self, det):
        bb = det["bbox"]
        return float(abs(bb[2] * bb[3]))

    def _gt_area(self, gt):
        if "area" in gt:
            return float(gt["area"])
        bb = gt["bbox"]
        return float(abs(bb[2] * bb[3]))


class RotatedCOCOEvaluator(COCOEvaluator):
    """COCO AP over rotated detections (reference :97).

    ``process`` accepts the batched static outputs of ``RROIHeads``
    inference — ``boxes`` is (B, D, 5) XYWHA in original-image coords —
    and emits 5-dim COCO result dicts; ``evaluate`` runs RotatedCOCOEval.
    """

    def process(self, inputs, outputs):
        reverse_id_mapping = None
        if hasattr(self._metadata, "thing_dataset_id_to_contiguous_id"):
            reverse_id_mapping = {
                v: k
                for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
            }
        boxes = np.asarray(outputs["boxes"])
        scores = np.asarray(outputs["scores"])
        classes = np.asarray(outputs["classes"])
        valid = np.asarray(outputs["valid"])
        image_ids = np.asarray(inputs["image_ids"])
        b, d = scores.shape
        for i in range(b):
            for j in range(d):
                if not valid[i, j]:
                    continue
                cat = int(classes[i, j])
                if reverse_id_mapping is not None:
                    cat = reverse_id_mapping[cat]
                self._predictions.append(
                    {
                        "image_id": int(image_ids[i]),
                        "category_id": cat,
                        "bbox": _to_xywha(boxes[i, j]),
                        "score": float(scores[i, j]),
                    }
                )

    def evaluate(self) -> Optional[Dict]:
        if self._distributed:
            comm.synchronize()
            predictions = comm.gather(self._predictions, dst=0)
            predictions = list(itertools.chain(*predictions))
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions

        if len(predictions) == 0:
            logger.warning("[RotatedCOCOEvaluator] Did not receive valid predictions.")
            return {}

        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(
                os.path.join(self._output_dir, "coco_instances_results.json"), "w"
            ) as f:
                json.dump(predictions, f)

        cocoeval = RotatedCOCOEval(self._coco_gt, iou_type="bbox", use_native=True)
        stats = cocoeval.evaluate(predictions)
        results = OrderedDict()
        results["bbox"] = {k: 100 * v for k, v in stats.items()}
        logger.info(f"Evaluation results for rotated bbox: {results['bbox']}")
        return results

"""COCO-style evaluator over the static batched output format.

Reference: detectron2/evaluation/coco_evaluation.py:30 (``COCOEvaluator``),
:357 (``instances_to_coco_json``), :421 (proposal AR eval). Predictions are
gathered across hosts with ``comm.gather``; rank 0 computes metrics using
the from-scratch numpy COCOeval (`.cocoeval`).
"""

from __future__ import annotations

import copy
import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from ..data.catalog import MetadataCatalog
from ..data.datasets.coco import convert_to_coco_dict
from ..data.rle import rle_string_encode
from ..utils import comm
from .cocoeval import COCOEval
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


def _paste_mask_np(mask: np.ndarray, box: np.ndarray, h: int, w: int, thresh=0.5) -> np.ndarray:
    """28x28 prob mask -> full-image bool mask (host-side, numpy bilinear).

    Matches the reference's ``_do_paste_mask`` (mask_ops.py:19) exactly:
    grid_sample with align_corners=False and ZERO padding — taps outside the
    mask contribute 0, so edge values fade over the outer half pixel (edge
    replication there measurably shifts mask AP for box-filling masks)."""
    s = mask.shape[0]
    x0, y0, x1, y1 = box

    def axis_taps(lo, hi, size):
        c = (np.arange(size) + 0.5 - lo) / max(hi - lo, 1e-6) * s - 0.5
        i0 = np.floor(c).astype(int)
        f = c - i0
        v0 = (i0 >= 0) & (i0 < s)
        v1 = (i0 + 1 >= 0) & (i0 + 1 < s)
        return np.clip(i0, 0, s - 1), np.clip(i0 + 1, 0, s - 1), f, v0, v1

    y0i, y1i, fy, vy0, vy1 = axis_taps(y0, y1, h)
    x0i, x1i, fx, vx0, vx1 = axis_taps(x0, x1, w)
    w00 = (1 - fy)[:, None] * (1 - fx)[None, :] * (vy0[:, None] & vx0[None, :])
    w01 = (1 - fy)[:, None] * fx[None, :] * (vy0[:, None] & vx1[None, :])
    w10 = fy[:, None] * (1 - fx)[None, :] * (vy1[:, None] & vx0[None, :])
    w11 = fy[:, None] * fx[None, :] * (vy1[:, None] & vx1[None, :])
    out = (
        mask[np.ix_(y0i, x0i)] * w00
        + mask[np.ix_(y0i, x1i)] * w01
        + mask[np.ix_(y1i, x0i)] * w10
        + mask[np.ix_(y1i, x1i)] * w11
    )
    return out >= thresh


def batched_outputs_to_coco_json(
    outputs: Dict[str, np.ndarray],
    image_ids: np.ndarray,
    orig_sizes: np.ndarray,
    reverse_id_mapping: Optional[Dict[int, int]] = None,
    with_masks: bool = False,
    image_sizes: Optional[np.ndarray] = None,  # (B, 2) network-input sizes
) -> List[dict]:
    """Static (B, D, ...) detections -> COCO result dicts
    (reference coco_evaluation.py:357 ``instances_to_coco_json``)."""
    results = []
    b, d = outputs["scores"].shape
    for i in range(b):
        valid = outputs["valid"][i]
        img_id = image_ids[i]
        # cityscapes-style datasets use string image ids
        img_id = img_id if isinstance(img_id, str) else int(img_id)
        h, w = int(orig_sizes[i][0]), int(orig_sizes[i][1])
        for j in range(d):
            if not valid[j]:
                continue
            x0, y0, x1, y1 = outputs["boxes"][i, j].tolist()
            cat = int(outputs["classes"][i, j])
            if reverse_id_mapping is not None:
                cat = reverse_id_mapping[cat]
            res = {
                "image_id": img_id,
                "category_id": cat,
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "score": float(outputs["scores"][i, j]),
            }
            if (
                with_masks
                and "masks_full" in outputs
                and outputs.get("no_paste") is not None
                and bool(outputs["no_paste"][i, j])
            ):
                # WSL no_paste path (reference postprocessing.py:63-70): the
                # mask is already full-image at network-input resolution —
                # crop the valid region and resize to the original size
                m = np.asarray(outputs["masks_full"][i, j], np.float32)
                if image_sizes is not None:
                    ih, iw = int(image_sizes[i][0]), int(image_sizes[i][1])
                    m = m[:ih, :iw]
                ys = np.clip(
                    (np.arange(h) + 0.5) * m.shape[0] / h - 0.5, 0, m.shape[0] - 1
                ).round().astype(int)
                xs = np.clip(
                    (np.arange(w) + 0.5) * m.shape[1] / w - 0.5, 0, m.shape[1] - 1
                ).round().astype(int)
                res["segmentation"] = rle_string_encode(
                    m[ys[:, None], xs[None, :]] >= 0.5
                )
            elif with_masks and "masks" in outputs:
                full = _paste_mask_np(
                    outputs["masks"][i, j].astype(np.float32),
                    outputs["boxes"][i, j],
                    h,
                    w,
                )
                res["segmentation"] = rle_string_encode(full)
            if "keypoints" in outputs:
                kps = np.asarray(outputs["keypoints"][i, j])  # (K, 4) x,y,logit,prob
                flat = []
                for x, y, _, p in kps:
                    flat.extend([float(x), float(y), 2.0])
                res["keypoints"] = flat
            results.append(res)
    return results


class COCOEvaluator(DatasetEvaluator):
    def __init__(
        self,
        dataset_name: str,
        tasks=None,
        distributed: bool = True,
        output_dir: Optional[str] = None,
        kpt_oks_sigmas=(),
    ):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        self._kpt_oks_sigmas = kpt_oks_sigmas
        self._metadata = MetadataCatalog.get(dataset_name)
        self._tasks = tasks

        if not hasattr(self._metadata, "json_file"):
            logger.info(
                f"'{dataset_name}' is not registered by `register_coco_instances`."
                " Converting it to COCO format ..."
            )
            self._coco_gt = convert_to_coco_dict(dataset_name)
        else:
            with open(self._metadata.json_file) as f:
                self._coco_gt = json.load(f)

        self._do_masks = False
        self._do_keypoints = False
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        reverse_id_mapping = None
        if hasattr(self._metadata, "thing_dataset_id_to_contiguous_id"):
            reverse_id_mapping = {
                v: k
                for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
            }
        with_masks = "masks" in outputs or "masks_full" in outputs
        self._do_masks = self._do_masks or with_masks
        # tasks are inferred from what the model emits (reference
        # coco_evaluation.py _tasks_from_predictions)
        self._do_keypoints = self._do_keypoints or "keypoints" in outputs
        self._predictions.extend(
            batched_outputs_to_coco_json(
                outputs,
                inputs["image_ids"],
                inputs["orig_sizes"],
                reverse_id_mapping,
                with_masks=with_masks,
                image_sizes=inputs.get("image_sizes"),
            )
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
            logger.warning("[COCOEvaluator] Did not receive valid predictions.")
            return {}

        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(os.path.join(self._output_dir, "coco_instances_results.json"), "w") as f:
                json.dump(predictions, f)

        tasks = self._tasks
        if not tasks:
            tasks = ("bbox",)
            if self._do_masks:
                tasks = tasks + ("segm",)
            if self._do_keypoints:
                tasks = tasks + ("keypoints",)
        results = OrderedDict()
        img_ids_with_preds = sorted({p["image_id"] for p in predictions})
        for task in tasks:
            cocoeval = COCOEval(
                self._coco_gt,
                iou_type=task,
                kpt_oks_sigmas=self._kpt_oks_sigmas,
            )
            stats = cocoeval.evaluate(predictions)
            results[task] = {k: 100 * v for k, v in stats.items()}
            logger.info(f"Evaluation results for {task}: {results[task]}")
        return results


class COCOProposalEvaluator(DatasetEvaluator):
    """Proposal AR@{100,1000} (reference coco_evaluation.py:421)."""

    def __init__(self, dataset_name: str, limits=(100, 1000)):
        self._metadata = MetadataCatalog.get(dataset_name)
        with open(self._metadata.json_file) as f:
            self._coco_gt = json.load(f)
        self._gt_by_img: Dict = {}
        for ann in self._coco_gt["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            self._gt_by_img.setdefault(ann["image_id"], []).append(ann["bbox"])
        self._limits = limits
        self._proposals: List[dict] = []

    def reset(self):
        self._proposals = []

    def process(self, inputs, outputs):
        b = inputs["image_ids"].shape[0]
        for i in range(b):
            boxes = np.asarray(outputs["proposals"][i])
            scores = np.asarray(outputs["scores"][i])
            valid = np.isfinite(scores)
            self._proposals.append(
                {
                    "image_id": int(inputs["image_ids"][i]),
                    "boxes": boxes[valid],
                    "scores": scores[valid],
                }
            )

    def evaluate(self):
        # COCO proposal AR: GREEDY one-to-one proposal->GT matching — after a
        # proposal is consumed by a GT it cannot also cover another — recall
        # averaged over IoU thresholds 0.5:0.05:0.95 pooled across images
        # (reference coco_evaluation.py _evaluate_box_proposals:476-490)
        thresholds = np.arange(0.5, 0.95 + 1e-5, 0.05)
        results = {}
        for limit in self._limits:
            best_ious = []
            for p in self._proposals:
                gts = np.asarray(self._gt_by_img.get(p["image_id"], []), dtype=np.float64)
                if len(gts) == 0:
                    continue
                gts_xyxy = gts.copy()
                gts_xyxy[:, 2:] += gts_xyxy[:, :2]
                order = np.argsort(-p["scores"])[:limit]
                boxes = p["boxes"][order]
                if len(boxes) == 0:
                    best_ious.append(np.zeros(len(gts)))
                    continue
                iou = _iou_np(gts_xyxy, boxes)  # (G, D)
                g = len(gts)
                gt_ovr = np.zeros(g)
                for j in range(min(g, len(boxes))):
                    gt_ind, box_ind = np.unravel_index(np.argmax(iou), iou.shape)
                    if iou[gt_ind, box_ind] < 0:
                        break
                    gt_ovr[j] = iou[gt_ind, box_ind]
                    iou[gt_ind, :] = -1
                    iou[:, box_ind] = -1
                best_ious.append(gt_ovr)
            if best_ious:
                best = np.concatenate(best_ious)
                ar = np.mean([np.mean(best >= t) for t in thresholds])
                results[f"AR@{limit}"] = 100.0 * float(ar)
        return {"box_proposals": results}


def _iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    iw = np.clip(
        np.minimum(a[:, None, 2], b[None, :, 2]) - np.maximum(a[:, None, 0], b[None, :, 0]), 0, None
    )
    ih = np.clip(
        np.minimum(a[:, None, 3], b[None, :, 3]) - np.maximum(a[:, None, 1], b[None, :, 1]), 0, None
    )
    inter = iw * ih
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = aa[:, None] + ab[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0)

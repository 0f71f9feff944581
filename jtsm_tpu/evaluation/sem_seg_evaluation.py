"""Semantic segmentation evaluator (reference:
detectron2/evaluation/sem_seg_evaluation.py:19 — per-pixel confusion matrix
-> mIoU / fwIoU / pACC / mACC)."""

from __future__ import annotations

import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Optional

import numpy as np
from PIL import Image

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..utils import comm
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


class SemSegEvaluator(DatasetEvaluator):
    def __init__(
        self,
        dataset_name: str,
        distributed: bool = True,
        output_dir: Optional[str] = None,
    ):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        meta = MetadataCatalog.get(dataset_name)
        self._num_classes = len(meta.stuff_classes)
        self._ignore_label = meta.get("ignore_label", 255)
        self._class_names = meta.stuff_classes
        self._gt_files = {
            d["file_name"]: d["sem_seg_file_name"] for d in DatasetCatalog.get(dataset_name)
            if "sem_seg_file_name" in d
        }
        self._gt_by_id = {
            d.get("image_id", d["file_name"]): d["sem_seg_file_name"]
            for d in DatasetCatalog.get(dataset_name)
            if "sem_seg_file_name" in d
        }
        self._conf_matrix = None

    def reset(self):
        self._conf_matrix = np.zeros(
            (self._num_classes + 1, self._num_classes + 1), dtype=np.int64
        )

    def process(self, inputs, outputs):
        """outputs['sem_seg']: (B, H, W) predicted class ids at original res,
        or (B, H, W, C) logits."""
        preds = outputs["sem_seg"]
        if not isinstance(preds, (list, tuple)):
            preds = np.asarray(preds)
        b = len(preds)
        for i in range(b):
            img_id = int(inputs["image_ids"][i]) if "image_ids" in inputs else None
            gt_file = self._gt_by_id.get(img_id)
            if gt_file is None:
                continue
            gt = np.asarray(Image.open(gt_file), dtype=np.int64)
            pred = np.asarray(preds[i])
            if pred.ndim == 3:
                pred = pred.argmax(-1)
            h, w = gt.shape
            pred = pred[:h, :w].astype(np.int64)
            gt = gt.copy()
            gt[gt == self._ignore_label] = self._num_classes
            self._conf_matrix += np.bincount(
                (self._num_classes + 1) * pred.reshape(-1) + gt.reshape(-1),
                minlength=self._conf_matrix.size,
            ).reshape(self._conf_matrix.shape)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            conf_matrix_list = comm.gather(self._conf_matrix, dst=0)
            if not comm.is_main_process():
                return {}
            self._conf_matrix = np.zeros_like(self._conf_matrix)
            for conf_matrix in conf_matrix_list:
                self._conf_matrix += conf_matrix

        acc = np.full(self._num_classes, np.nan, dtype=np.float64)
        iou = np.full(self._num_classes, np.nan, dtype=np.float64)
        tp = self._conf_matrix.diagonal()[:-1].astype(np.float64)
        pos_gt = np.sum(self._conf_matrix[:-1, :-1], axis=0).astype(np.float64)
        class_weights = pos_gt / max(np.sum(pos_gt), 1)
        pos_pred = np.sum(self._conf_matrix[:-1, :-1], axis=1).astype(np.float64)
        acc_valid = pos_gt > 0
        acc[acc_valid] = tp[acc_valid] / pos_gt[acc_valid]
        iou_valid = (pos_gt + pos_pred) > 0
        union = pos_gt + pos_pred - tp
        iou[acc_valid] = tp[acc_valid] / union[acc_valid]
        macc = np.sum(acc[acc_valid]) / max(np.sum(acc_valid), 1)
        miou = np.sum(iou[acc_valid]) / max(np.sum(iou_valid), 1)
        fiou = np.sum(iou[acc_valid] * class_weights[acc_valid])
        pacc = np.sum(tp) / max(np.sum(pos_gt), 1)

        res = {
            "mIoU": 100 * miou,
            "fwIoU": 100 * fiou,
            "mACC": 100 * macc,
            "pACC": 100 * pacc,
        }
        for i, name in enumerate(self._class_names):
            res[f"IoU-{name}"] = 100 * iou[i]
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(os.path.join(self._output_dir, "sem_seg_evaluation.json"), "w") as f:
                json.dump(res, f)
        results = OrderedDict({"sem_seg": res})
        logger.info(results)
        return results

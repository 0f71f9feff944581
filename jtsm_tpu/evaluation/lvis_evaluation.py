"""LVIS evaluator (reference: detectron2/evaluation/lvis_evaluation.py).

Reuses the from-scratch COCOEval protocol with LVIS particulars: maxDets 300
and per-image "not exhaustive"/negative category handling (dets of a
category neither positive nor negative in an image are ignored).
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
from .coco_evaluation import batched_outputs_to_coco_json
from .cocoeval import COCOEval
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


class LVISEval(COCOEval):
    """COCO protocol + LVIS particulars: maxDets 300 (LVIS caps 300
    detections per image; applied per image-category pair here, which is
    equivalent whenever the detector emits <=300 per image), federated
    ignore rules, and frequency-bucket APs (APr/APc/APf)."""

    def __init__(self, gt_dataset: Dict, iou_type: str = "bbox"):
        super().__init__(gt_dataset, iou_type, max_dets=(300,))
        self._cat_freq = {
            c["id"]: c.get("frequency", "f") for c in gt_dataset.get("categories", [])
        }
        self._img_neg = {
            img["id"]: set(img.get("neg_category_ids", []))
            for img in gt_dataset["images"]
        }
        self._img_pos = {}
        for ann in gt_dataset.get("annotations", []):
            self._img_pos.setdefault(ann["image_id"], set()).add(ann["category_id"])

    def _keep_det(self, det) -> bool:
        img_id = det["image_id"]
        cat = det["category_id"]
        pos = self._img_pos.get(img_id, set())
        neg = self._img_neg.get(img_id, set())
        # detections of categories not annotated (pos or neg) are dropped
        return cat in pos or cat in neg

    def evaluate(self, detections: List[Dict], img_ids=None):
        detections = [d for d in detections if self._keep_det(d)]
        stats = super().evaluate(detections, img_ids)
        # LVIS frequency buckets: AP over rare/common/frequent categories
        for bucket, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
            ks = [
                ki
                for ki, cid in enumerate(self.cat_ids)
                if self._cat_freq.get(cid) == bucket
            ]
            if ks:
                s = self.precision[:, :, ks, 0, -1]
                valid = s[s > -1]
                stats[key] = float(np.mean(valid)) if valid.size else float("nan")
            else:
                stats[key] = float("nan")
        return stats


class LVISEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str, distributed: bool = True, output_dir=None):
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        self._metadata = MetadataCatalog.get(dataset_name)
        with open(self._metadata.json_file) as f:
            self._gt = json.load(f)
        self._do_masks = False
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        with_masks = "masks" in outputs
        self._do_masks = self._do_masks or with_masks
        # LVIS contiguous ids are dataset_id - 1
        preds = batched_outputs_to_coco_json(
            outputs, inputs["image_ids"], inputs["orig_sizes"], None, with_masks
        )
        for p in preds:
            p["category_id"] += 1
        self._predictions.extend(preds)

    def evaluate(self):
        if self._distributed:
            comm.synchronize()
            predictions = list(
                itertools.chain(*comm.gather(self._predictions, dst=0))
            )
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions
        if not predictions:
            logger.warning("[LVISEvaluator] no predictions")
            return {}
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(os.path.join(self._output_dir, "lvis_instances_results.json"), "w") as f:
                json.dump(predictions, f)
        tasks = ("bbox", "segm") if self._do_masks else ("bbox",)
        results = OrderedDict()
        for task in tasks:
            stats = LVISEval(self._gt, iou_type=task).evaluate(predictions)
            results[task] = {k: 100 * v for k, v in stats.items()}
            logger.info(f"LVIS {task}: {results[task]}")
        return results

"""Cityscapes evaluators (reference:
detectron2/evaluation/cityscapes_evaluation.py — defers to cityscapesscripts,
absent here).

* ``CityscapesInstanceEvaluator``: instance AP over the 8 thing classes via
  the COCO matching protocol (the official cityscapesscripts protocol
  differs in ignore-region handling; this is the standard approximation).
* ``CityscapesSemSegEvaluator``: per-pixel mIoU via SemSegEvaluator.
"""

from __future__ import annotations

import itertools
import logging
from collections import OrderedDict
from typing import List

import numpy as np

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..structures import BoxMode
from ..utils import comm
from .coco_evaluation import batched_outputs_to_coco_json
from .cocoeval import COCOEval
from .evaluator import DatasetEvaluator
from .sem_seg_evaluation import SemSegEvaluator

logger = logging.getLogger(__name__)


class CityscapesInstanceEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str):
        self._dataset_name = dataset_name
        self._metadata = MetadataCatalog.get(dataset_name)
        # build a COCO-format gt dict from the dataset dicts
        dicts = DatasetCatalog.get(dataset_name)
        images, annotations = [], []
        self._id_map = {}
        for i, d in enumerate(dicts):
            img_id = i
            self._id_map[d["image_id"]] = img_id
            images.append(
                {"id": img_id, "height": d["height"], "width": d["width"]}
            )
            for ann in d.get("annotations", []):
                bbox = BoxMode.convert(ann["bbox"], ann["bbox_mode"], BoxMode.XYWH_ABS)
                annotations.append(
                    {
                        "id": len(annotations) + 1,
                        "image_id": img_id,
                        "category_id": ann["category_id"] + 1,
                        "bbox": list(bbox),
                        "area": float(bbox[2] * bbox[3]),
                        "iscrowd": ann.get("iscrowd", 0),
                    }
                )
        cats = [
            {"id": c + 1, "name": n}
            for c, n in enumerate(self._metadata.thing_classes)
        ]
        self._gt = {"images": images, "annotations": annotations, "categories": cats}
        self._str_ids = {d["image_id"]: i for i, d in enumerate(dicts)}
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        preds = batched_outputs_to_coco_json(
            outputs, inputs["image_ids"], inputs["orig_sizes"], None, False
        )
        for p in preds:
            p["category_id"] += 1
            # cityscapes image ids are strings; the loader maps to indices
            if p["image_id"] in self._str_ids:
                p["image_id"] = self._str_ids[p["image_id"]]
        self._predictions.extend(preds)

    def evaluate(self):
        comm.synchronize()
        predictions = list(itertools.chain(*comm.gather(self._predictions, dst=0)))
        if not comm.is_main_process():
            return {}
        if not predictions:
            return {}
        stats = COCOEval(self._gt, "bbox").evaluate(predictions)
        ret = OrderedDict(
            {"segm": {"AP": 100 * stats["AP"], "AP50": 100 * stats["AP50"]}}
        )
        logger.info(ret)
        return ret


class CityscapesSemSegEvaluator(SemSegEvaluator):
    pass

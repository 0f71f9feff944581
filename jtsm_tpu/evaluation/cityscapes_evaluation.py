"""Cityscapes evaluators (reference:
detectron2/evaluation/cityscapes_evaluation.py — defers to cityscapesscripts,
which is absent in this environment; the protocols are implemented in-repo).

* ``CityscapesInstanceEvaluator``: instance **mask** AP over the 8 thing
  classes — predicted masks are RLE-encoded and matched against rasterized
  gt polygons with segm-mode COCOEval (reference
  cityscapes_evaluation.py:96-108 uses the cityscapesscripts instance
  protocol, which differs from COCO matching only in its ignore-region and
  minRegionSize handling).
* ``CityscapesSemSegEvaluator``: the official label-mapped pixel protocol
  (reference cityscapes_evaluation.py:140-172): predictions in trainId
  space are mapped through the cityscapes label table, scored against
  ``*_gtFine_labelIds.png`` over the 19 eval classes and the 7 categories,
  with ignoreInEval labels excluded; instance-weighted iIoU uses
  ``*_gtFine_instanceIds.png`` when present.
"""

from __future__ import annotations

import itertools
import logging
import os
from collections import OrderedDict
from typing import List

import numpy as np

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..data.datasets.cityscapes_labels import id2label, labels, name2label
from ..data.rle import rle_area, rle_string_encode
from ..structures import BoxMode
from ..structures.masks import polygons_to_bitmask
from ..utils import comm
from .coco_evaluation import batched_outputs_to_coco_json
from .cocoeval import COCOEval
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


class CityscapesInstanceEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str):
        self._dataset_name = dataset_name
        self._metadata = MetadataCatalog.get(dataset_name)
        # build a COCO-format gt dict (with rasterized instance masks) from
        # the dataset dicts
        dicts = DatasetCatalog.get(dataset_name)
        images, annotations = [], []
        self._id_map = {}
        for i, d in enumerate(dicts):
            img_id = i
            self._id_map[d["image_id"]] = img_id
            h, w = d["height"], d["width"]
            images.append({"id": img_id, "height": h, "width": w})
            for ann in d.get("annotations", []):
                bbox = BoxMode.convert(ann["bbox"], ann["bbox_mode"], BoxMode.XYWH_ABS)
                segm = ann.get("segmentation")
                if isinstance(segm, list):
                    mask = polygons_to_bitmask(
                        [np.asarray(p, dtype=np.float64) for p in segm], h, w
                    )
                    rle = rle_string_encode(mask)
                    area = float(mask.sum())
                elif isinstance(segm, dict):
                    rle = segm
                    area = float(rle_area(segm))
                else:
                    # box-only annotation: synthesize the box mask so
                    # segm-mode IoU stays well-defined
                    mask = np.zeros((h, w), dtype=bool)
                    x0, y0 = int(bbox[0]), int(bbox[1])
                    x1 = min(int(np.ceil(bbox[0] + bbox[2])), w)
                    y1 = min(int(np.ceil(bbox[1] + bbox[3])), h)
                    mask[max(y0, 0) : y1, max(x0, 0) : x1] = True
                    rle = rle_string_encode(mask)
                    area = float(mask.sum())
                annotations.append(
                    {
                        "id": len(annotations) + 1,
                        "image_id": img_id,
                        "category_id": ann["category_id"] + 1,
                        "bbox": list(bbox),
                        "segmentation": rle,
                        "area": area,
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
            outputs,
            inputs["image_ids"],
            inputs["orig_sizes"],
            None,
            True,
            image_sizes=inputs.get("image_sizes"),
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
        stats = COCOEval(self._gt, "segm").evaluate(predictions)
        ret = OrderedDict(
            {"segm": {"AP": 100 * stats["AP"], "AP50": 100 * stats["AP50"]}}
        )
        logger.info(ret)
        return ret


class CityscapesSemSegEvaluator(DatasetEvaluator):
    """Official cityscapes pixel-level protocol. Predictions arrive as
    trainId maps (the 19-class training space, the network's output space);
    gt is read from ``*_gtFine_labelIds.png``. IoU is computed per eval
    class and per category; iIoU additionally weights each gt instance's
    pixels by (class average instance size / instance size), using
    ``*_gtFine_instanceIds.png``."""

    # eval classes in trainId order 0..18
    _EVAL = [l for l in labels if not l.ignoreInEval and l.trainId != 255]

    def __init__(self, dataset_name: str, distributed: bool = True, output_dir=None):
        self._dataset_name = dataset_name
        meta = MetadataCatalog.get(dataset_name)
        dicts = DatasetCatalog.get(dataset_name)
        self._gt_by_id = {
            d.get("image_id", d["file_name"]): d["sem_seg_file_name"]
            for d in dicts
            if "sem_seg_file_name" in d
        }
        self._n = len(self._EVAL)
        # labelId -> dense eval index (self._n == not-evaluated)
        self._id_to_idx = np.full(256, self._n, dtype=np.int64)
        for idx, l in enumerate(self._EVAL):
            self._id_to_idx[l.id] = idx
        # trainId -> eval index (trainIds of eval classes are 0..18 in order)
        self._train_to_idx = np.full(256, self._n, dtype=np.int64)
        for idx, l in enumerate(self._EVAL):
            self._train_to_idx[l.trainId] = idx

    def reset(self):
        self._conf = np.zeros((self._n + 1, self._n + 1), dtype=np.int64)
        # per-gt-instance records for iIoU: (eval_idx, inst_size, tp_pixels)
        self._inst_records: List[tuple] = []

    def _gt_arrays(self, gt_file):
        from PIL import Image

        gt_ids = np.asarray(Image.open(gt_file), dtype=np.int64)
        inst_file = gt_file.replace("_labelIds.png", "_instanceIds.png")
        inst_ids = None
        if inst_file != gt_file and os.path.exists(inst_file):
            inst_ids = np.asarray(Image.open(inst_file), dtype=np.int64)
        return gt_ids, inst_ids

    def process(self, inputs, outputs):
        preds = outputs["sem_seg"]
        if not isinstance(preds, (list, tuple)):
            preds = np.asarray(preds)
        for i in range(len(preds)):
            img_id = inputs["image_ids"][i] if "image_ids" in inputs else None
            if hasattr(img_id, "item"):
                img_id = img_id.item()
            gt_file = self._gt_by_id.get(img_id)
            if gt_file is None:
                continue
            pred = np.asarray(preds[i])
            if pred.ndim == 3:  # (H, W, C) logits
                pred = pred.argmax(-1)
            gt_ids, inst_ids = self._gt_arrays(gt_file)
            pred_idx = self._train_to_idx[np.clip(pred, 0, 255)]
            gt_idx = self._id_to_idx[np.clip(gt_ids, 0, 255)]
            self._conf += np.bincount(
                gt_idx.reshape(-1) * (self._n + 1) + pred_idx.reshape(-1),
                minlength=(self._n + 1) ** 2,
            ).reshape(self._n + 1, self._n + 1)
            if inst_ids is not None:
                # instances are encoded as labelId*1000 + k (k>=0); ids <1000
                # are pure-semantic regions
                for iid in np.unique(inst_ids[inst_ids >= 1000]):
                    l = id2label.get(int(iid) // 1000)
                    if l is None or l.ignoreInEval or l.trainId == 255 or not l.hasInstances:
                        continue
                    idx = int(self._id_to_idx[l.id])
                    m = inst_ids == iid
                    tp = int((pred_idx[m] == idx).sum())
                    self._inst_records.append((idx, int(m.sum()), tp))

    def evaluate(self):
        comm.synchronize()
        confs = comm.gather(self._conf, dst=0)
        recs = comm.gather(self._inst_records, dst=0)
        if not comm.is_main_process():
            return {}
        conf = sum(confs[1:], confs[0].copy())
        inst_records = list(itertools.chain(*recs))

        # official formulas (evalPixelLevelSemanticLabeling.getIouScoreForLabel):
        # fn counts every mispredicted gt-c pixel; fp counts predictions of c
        # only on NOT-ignored gt of other classes (void gt never contributes fp)
        tp = np.diag(conf)[: self._n].astype(np.float64)
        fp = conf[: self._n, : self._n].sum(0) - tp
        fn = conf[: self._n, : self._n].sum(1) + conf[: self._n, self._n] - tp
        denom = tp + fp + fn
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)

        # categories: merge eval classes by category
        cats = sorted({l.category for l in self._EVAL})
        cat_iou = {}
        for c in cats:
            sel = np.asarray([l.category == c for l in self._EVAL])
            m = conf[: self._n, : self._n]
            ctp = float(m[np.ix_(sel, sel)].sum())
            cfp = float(m[np.ix_(~sel, sel)].sum())
            cfn = float(m[np.ix_(sel, ~sel)].sum() + conf[: self._n, self._n][sel].sum())
            d = ctp + cfp + cfn
            cat_iou[c] = ctp / d if d > 0 else np.nan

        # iIoU: instance-size-normalized TP/FN for instance classes
        # (getInstanceIouScoreForLabel: tp/fn weighted by avgClassSize/instSize,
        # fp stays the plain pixel count)
        inst_classes = [i for i, l in enumerate(self._EVAL) if l.hasInstances]
        i_iou, i_parts = {}, {}
        if inst_records:
            sizes = {}
            for idx, size, _tp in inst_records:
                sizes.setdefault(idx, []).append(size)
            avg = {idx: float(np.mean(v)) for idx, v in sizes.items()}
            for idx in inst_classes:
                recs_c = [r for r in inst_records if r[0] == idx]
                if not recs_c:
                    continue
                w = [avg[idx] / max(size, 1) for _, size, _tp in recs_c]
                itp = sum(wi * tp_i for wi, (_, _, tp_i) in zip(w, recs_c))
                ifn = sum(
                    wi * (size - tp_i) for wi, (_, size, tp_i) in zip(w, recs_c)
                )
                fpc = float(fp[idx])
                i_parts[idx] = (itp, ifn, fpc)
                d = itp + fpc + ifn
                i_iou[idx] = itp / d if d > 0 else np.nan

        valid = ~np.isnan(iou)
        ret = OrderedDict()
        ret["sem_seg"] = {
            "IoU": 100.0 * float(np.nanmean(iou)) if valid.any() else float("nan"),
            "iIoU": 100.0 * float(np.mean(list(i_iou.values()))) if i_iou else float("nan"),
            "IoU_sup": 100.0 * float(np.nanmean(list(cat_iou.values()))),
            "iIoU_sup": float("nan"),
        }
        # per-class detail (mirrors the official per-class print)
        for idx, l in enumerate(self._EVAL):
            ret["sem_seg"][f"IoU-{l.name}"] = 100.0 * float(iou[idx])
        # category-level iIoU: weighted tp/fn and plain fp aggregated per
        # category over its instance classes (getInstanceIouScoreForCategory)
        if i_parts:
            cat_parts = {}
            for idx, (itp, ifn, fpc) in i_parts.items():
                c = self._EVAL[idx].category
                a = cat_parts.setdefault(c, [0.0, 0.0, 0.0])
                a[0] += itp
                a[1] += ifn
                a[2] += fpc
            vals = [
                itp / (itp + ifn + fpc)
                for itp, ifn, fpc in cat_parts.values()
                if itp + ifn + fpc > 0
            ]
            if vals:
                ret["sem_seg"]["iIoU_sup"] = 100.0 * float(np.mean(vals))
        logger.info(ret)
        return ret

"""Pascal VOC detection AP + CorLoc (reference:
detectron2/evaluation/pascal_voc_evaluation.py:21 — 11-point '07 metric or
all-point '12 metric; the fork evaluates AP and CorLoc over IoU 0.5:0.05:0.95,
reporting AP/AP50/AP75 and CL/CL50/CL75, reference :118-170,:358-452)."""

from __future__ import annotations

import itertools
import logging
import os
import xml.etree.ElementTree as ET
from collections import OrderedDict, defaultdict
from typing import Dict, List

import numpy as np

from ..data.catalog import MetadataCatalog
from ..utils import comm
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = np.max(prec[rec >= t]) if np.sum(rec >= t) > 0 else 0.0
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def voc_eval_class(
    dets: List[dict], gts_by_image: Dict, ovthresh: float = 0.5, use_07_metric: bool = False
):
    """dets: [{image_id, bbox XYXY, score}]; gts_by_image: image_id ->
    {'bbox': (N,4) XYXY, 'difficult': (N,) bool}."""
    class_recs = {}
    npos = 0
    for image_id, rec in gts_by_image.items():
        difficult = np.asarray(rec["difficult"], dtype=bool)
        class_recs[image_id] = {
            "bbox": np.asarray(rec["bbox"], dtype=np.float64).reshape(-1, 4),
            "difficult": difficult,
            "det": [False] * len(difficult),
        }
        npos += int((~difficult).sum())

    dets = sorted(dets, key=lambda d: -d["score"])
    nd = len(dets)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d_i, det in enumerate(dets):
        r = class_recs.get(det["image_id"])
        bb = np.asarray(det["bbox"], dtype=np.float64)
        ovmax = -np.inf
        jmax = -1
        if r is not None and len(r["bbox"]):
            bbgt = r["bbox"]
            ixmin = np.maximum(bbgt[:, 0], bb[0])
            iymin = np.maximum(bbgt[:, 1], bb[1])
            ixmax = np.minimum(bbgt[:, 2], bb[2])
            iymax = np.minimum(bbgt[:, 3], bb[3])
            iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
            ih = np.maximum(iymax - iymin + 1.0, 0.0)
            inters = iw * ih
            uni = (
                (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                + (bbgt[:, 2] - bbgt[:, 0] + 1.0) * (bbgt[:, 3] - bbgt[:, 1] + 1.0)
                - inters
            )
            overlaps = inters / uni
            ovmax = np.max(overlaps)
            jmax = int(np.argmax(overlaps))
        if ovmax > ovthresh:
            if not r["difficult"][jmax]:
                if not r["det"][jmax]:
                    tp[d_i] = 1.0
                    r["det"][jmax] = True
                else:
                    fp[d_i] = 1.0
        else:
            fp[d_i] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec, use_07_metric)


def voc_eval_corloc_class(
    dets: List[dict], gts_by_image: Dict, ovthresh: float = 0.5
) -> float:
    """Correct-localization rate: per image, only the single highest-scoring
    detection of the class is judged; CorLoc = (#images whose top detection
    overlaps a GT of the class at >= ovthresh) / (#images that contain at
    least one non-difficult GT of the class). Images whose GT for the class
    is entirely difficult (or absent) are excluded from both counts
    (reference pascal_voc_evaluation.py:358-452)."""
    npos_im = 0
    class_recs = {}
    for image_id, rec in gts_by_image.items():
        difficult = np.asarray(rec["difficult"], dtype=bool)
        bbox = np.asarray(rec["bbox"], dtype=np.float64).reshape(-1, 4)
        class_recs[image_id] = {"bbox": bbox, "difficult": difficult}
        if len(difficult) > 0:
            npos_im += min(1, int((~difficult).sum()))
    if npos_im == 0:
        return 0.0

    dets = sorted(dets, key=lambda d: -d["score"])
    seen = set()
    n_correct = 0
    for det in dets:
        image_id = det["image_id"]
        if image_id in seen:
            continue
        r = class_recs.get(image_id)
        if r is None or len(r["difficult"]) == 0 or bool(r["difficult"].all()):
            # no (non-difficult) GT of this class in the image: skipped, like
            # the reference's all_difficult guard
            continue
        seen.add(image_id)
        bb = np.asarray(det["bbox"], dtype=np.float64)
        bbgt = r["bbox"]
        ixmin = np.maximum(bbgt[:, 0], bb[0])
        iymin = np.maximum(bbgt[:, 1], bb[1])
        ixmax = np.minimum(bbgt[:, 2], bb[2])
        iymax = np.minimum(bbgt[:, 3], bb[3])
        iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
        ih = np.maximum(iymax - iymin + 1.0, 0.0)
        inters = iw * ih
        uni = (
            (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
            + (bbgt[:, 2] - bbgt[:, 0] + 1.0) * (bbgt[:, 3] - bbgt[:, 1] + 1.0)
            - inters
        )
        if np.max(inters / uni) > ovthresh:
            n_correct += 1
    return n_correct / npos_im


class PascalVOCDetectionEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str):
        self._dataset_name = dataset_name
        meta = MetadataCatalog.get(dataset_name)
        self._class_names = meta.thing_classes
        self._is_2007 = meta.get("year", 2007) == 2007
        self._anno_file_template = os.path.join(
            meta.dirname, "Annotations", "{}.xml"
        ) if meta.get("dirname") else None
        self._image_set_path = (
            os.path.join(meta.dirname, "ImageSets", "Main", meta.split + ".txt")
            if meta.get("dirname")
            else None
        )
        self._predictions = defaultdict(list)

    def reset(self):
        self._predictions = defaultdict(list)

    def process(self, inputs, outputs):
        b = outputs["scores"].shape[0]
        for i in range(b):
            image_id = inputs["image_ids"][i]
            valid = outputs["valid"][i]
            for j in np.nonzero(valid)[0]:
                self._predictions[int(outputs["classes"][i, j])].append(
                    {
                        "image_id": int(image_id)
                        if not isinstance(image_id, str)
                        else image_id,
                        "bbox": outputs["boxes"][i, j].tolist(),
                        "score": float(outputs["scores"][i, j]),
                    }
                )

    def gt_for_class(self, cls_idx: int) -> Dict:
        """Parse VOC xml gt for one class (requires metadata dirname/split)."""
        from ..data.catalog import DatasetCatalog

        gts = {}
        cls_name = self._class_names[cls_idx]
        for d in DatasetCatalog.get(self._dataset_name):
            boxes, difficult = [], []
            for ann in d.get("annotations", []):
                if ann["category_id"] == cls_idx:
                    boxes.append(ann["bbox"])
                    difficult.append(ann.get("difficult", False))
            gts[d.get("image_id", d["file_name"])] = {
                "bbox": boxes,
                "difficult": difficult,
            }
        return gts

    def evaluate(self):
        comm.synchronize()
        all_predictions = comm.gather(dict(self._predictions), dst=0)
        if not comm.is_main_process():
            return {}
        predictions = defaultdict(list)
        for predictions_per_rank in all_predictions:
            for clsid, lines in predictions_per_rank.items():
                predictions[clsid].extend(lines)

        # AP and CorLoc over IoU 0.5:0.05:0.95 per the fork's protocol
        # (reference pascal_voc_evaluation.py:118-170)
        aps = defaultdict(list)  # thresh -> per-class AP
        corlocs = defaultdict(list)
        ap50_per_class = {}
        for cls_idx, cls_name in enumerate(self._class_names):
            gts = self.gt_for_class(cls_idx)
            dets = predictions.get(cls_idx, [])
            for thresh in range(50, 100, 5):
                _, _, ap = voc_eval_class(dets, gts, thresh / 100.0, self._is_2007)
                aps[thresh].append(ap * 100)
                corlocs[thresh].append(
                    voc_eval_corloc_class(dets, gts, thresh / 100.0) * 100
                )
            ap50_per_class[cls_name] = aps[50][-1]

        m_ap = {t: float(np.mean(x)) for t, x in aps.items()}
        m_cl = {t: float(np.mean(x)) for t, x in corlocs.items()}
        ret = OrderedDict()
        ret["bbox"] = {
            "AP": float(np.mean(list(m_ap.values()))),
            "AP50": m_ap[50],
            "AP75": m_ap[75],
        }
        ret["bbox CorLoc"] = {
            "CL": float(np.mean(list(m_cl.values()))),
            "CL50": m_cl[50],
            "CL75": m_cl[75],
        }
        logger.info(
            "VOC AP50: {:.2f}  AP: {:.2f}  CorLoc50: {:.2f}".format(
                m_ap[50], ret["bbox"]["AP"], m_cl[50]
            )
        )
        logger.info(
            "per-class AP50: "
            + " ".join(f"{n}={v:.1f}" for n, v in ap50_per_class.items())
        )
        return ret

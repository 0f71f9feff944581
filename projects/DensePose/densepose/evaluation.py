"""DensePose evaluation (reference:
projects/DensePose/densepose/densepose_coco_evaluation.py, 1176 LoC — GPS /
GPSm metrics via the COCO evaluation machinery).

Protocol adopted from the reference:
* the full per-threshold COCO matching machinery (computeOgps feeding the
  standard evaluateImg/accumulate, reference :318,:569,:619) — run here
  through ``COCOEval(iou_type="custom")`` with the OGPS matrix as the
  similarity;
* per-GT-point normalization by the part's mean geodesic distance
  (``Mean_Distances[CoarseParts[dp_I]]``, reference :163-167);
* reference point geometry: gt dp points are scaled by gt_box/255 and
  shifted into the DETECTION box frame; points outside the detection box
  contribute part-0 predictions (reference :590-610).

Documented substitution: true geodesic distances require the SMPL mesh
tables (SMPL_subdiv.mat / Pdist_matrix.pkl, downloaded at runtime by the
reference — not redistributable, no egress here). Within-patch UV euclidean
distance is used instead, with cross-patch points at the max distance. GPSm
geometric-means GPS with the mask IoU between the predicted fg chart and
the gt mask (reference :738 ``sqrt(iousM * ious)``).
"""

from __future__ import annotations

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List

import numpy as np

from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from jtsm_tpu.evaluation.cocoeval import COCOEval
from jtsm_tpu.evaluation.evaluator import DatasetEvaluator
from jtsm_tpu.utils import comm

logger = logging.getLogger(__name__)

# Mean geodesic distances per coarse part + the 24->8 coarse part grouping
# (reference densepose_coco_evaluation.py:166-171; public constants)
MEAN_DISTANCES = np.array([0, 0.351, 0.107, 0.126, 0.237, 0.173, 0.142, 0.128, 0.150])
COARSE_PARTS = np.array(
    [0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8]
)


def point_kappas(gt_part_ids: np.ndarray) -> np.ndarray:
    """Per-point normalization constant from the gt part index
    (reference :639-641, CSE branch: Mean_Distances[CoarseParts[dp_I]])."""
    idx = np.clip(np.asarray(gt_part_ids, int), 0, len(COARSE_PARTS) - 1)
    return MEAN_DISTANCES[COARSE_PARTS[idx]]


def gps_similarity(
    pred_patch: np.ndarray,  # (P,) predicted patch index at gt points
    pred_u: np.ndarray,
    pred_v: np.ndarray,
    gt_patch: np.ndarray,
    gt_u: np.ndarray,
    gt_v: np.ndarray,
    valid: np.ndarray,
    kappa=0.255,
) -> float:
    """Mean point similarity for one (det, gt) pair. ``kappa`` may be a
    scalar or a per-point array (the reference's per-part normalization)."""
    if valid.sum() == 0:
        return 0.0
    same = (pred_patch == gt_patch) & valid
    d = np.sqrt((pred_u - gt_u) ** 2 + (pred_v - gt_v) ** 2)
    dist = np.where(same, d, 1.0)  # cross-patch => max distance
    kap = np.broadcast_to(np.asarray(kappa, np.float64), dist.shape)
    sim = np.exp(-(dist**2) / (2 * np.maximum(kap, 1e-6) ** 2))
    return float(np.sum(sim * valid) / np.maximum(valid.sum(), 1))


def _ogps_pair(det: dict, ann: dict, gpsm: bool) -> float:
    """OGPS between one detection (box XYXY + patch/u/v maps over the box)
    and one gt annotation with dp_* point labels (reference computeOgps
    inner loop)."""
    gx, gy, gw, gh = [float(v) for v in ann["bbox"]]  # gt XYWH
    db = det["box"]
    dx0, dy0 = float(db[0]), float(db[1])
    dw = max(float(db[2]) - dx0, 1e-3)
    dh = max(float(db[3]) - dy0, 1e-3)
    dp_x = np.asarray(ann["dp_x"], np.float64) * gw / 255.0
    dp_y = np.asarray(ann["dp_y"], np.float64) * gh / 255.0
    px = dp_x + gx - dx0
    py = dp_y + gy - dy0
    inside = (px >= 0) & (py >= 0) & (px < dw) & (py < dh)
    if len(px) == 0 or not inside.any():
        return 0.0
    hm, wm = det["u_map"].shape
    ix = np.clip((px / dw * (wm - 1)).astype(int), 0, wm - 1)
    iy = np.clip((py / dh * (hm - 1)).astype(int), 0, hm - 1)
    pred_patch = np.where(inside, det["patch_map"][iy, ix], 0)
    pred_u = np.where(inside, det["u_map"][iy, ix], 0.0)
    pred_v = np.where(inside, det["v_map"][iy, ix], 0.0)
    gt_i = np.asarray(ann["dp_I"])
    gps = gps_similarity(
        pred_patch,
        pred_u,
        pred_v,
        gt_i,
        np.asarray(ann["dp_U"]),
        np.asarray(ann["dp_V"]),
        np.ones(len(px), bool),
        kappa=point_kappas(gt_i),
    )
    if gpsm:
        pred_fg = det["patch_map"] > 0
        gt_fg = np.zeros_like(pred_fg)
        gxs = np.clip((px / dw * (wm - 1)).astype(int), 0, wm - 1)
        gys = np.clip((py / dh * (hm - 1)).astype(int), 0, hm - 1)
        gt_fg[gys[inside], gxs[inside]] = True
        inter = np.logical_and(pred_fg, gt_fg).sum()
        union = np.logical_or(pred_fg, gt_fg).sum()
        gps = float(np.sqrt(gps * (inter / max(union, 1))))
    return gps


class DensePoseCOCOEvaluator(DatasetEvaluator):
    """GPS / GPSm AP over the COCO per-threshold matching machinery."""

    def __init__(self, dataset_name: str, eval_mode: str = "gps"):
        assert eval_mode in ("gps", "gpsm"), eval_mode
        self._eval_mode = eval_mode
        self._dataset_name = dataset_name
        dicts = DatasetCatalog.get(dataset_name)
        images, annotations = [], []
        self._gt_by_image = {}
        for d in dicts:
            img_id = int(d["image_id"])
            images.append(
                {
                    "id": img_id,
                    "height": d.get("height", 0),
                    "width": d.get("width", 0),
                }
            )
            for ann in d.get("annotations", []):
                if "dp_x" not in ann:
                    continue
                bbox = list(map(float, ann["bbox"]))
                a = {
                    "id": len(annotations) + 1,
                    "image_id": img_id,
                    "category_id": 1,
                    "bbox": bbox,  # XYWH
                    "area": float(bbox[2] * bbox[3]),
                    "iscrowd": ann.get("iscrowd", 0),
                    "dp_x": ann["dp_x"],
                    "dp_y": ann["dp_y"],
                    "dp_I": ann["dp_I"],
                    "dp_U": ann["dp_U"],
                    "dp_V": ann["dp_V"],
                }
                annotations.append(a)
        self._gt = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs, outputs):
        """outputs must carry per-detection densepose dicts under
        'densepose': list (B) of lists of {box, score?, patch_map, u_map,
        v_map}."""
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

        detections = []
        det_payload = {}
        for p in preds:
            for d in p["dets"]:
                x0, y0, x1, y1 = [float(v) for v in d["box"]]
                det = {
                    "image_id": p["image_id"],
                    "category_id": 1,
                    "score": float(d.get("score", 1.0)),
                    "bbox": [x0, y0, x1 - x0, y1 - y0],
                }
                det_payload[id(det)] = d
                detections.append(det)

        gpsm = self._eval_mode == "gpsm"

        def ogps_fn(dets, gts, img_id):
            m = np.zeros((len(dets), len(gts)))
            for i, det in enumerate(dets):
                payload = det_payload[id(det)]
                for j, ann in enumerate(gts):
                    if not ann.get("iscrowd", 0):
                        m[i, j] = _ogps_pair(payload, ann, gpsm)
            return m

        ev = COCOEval(self._gt, iou_type="custom", iou_fn=ogps_fn, use_native=False)
        stats = ev.evaluate(detections)
        key = "GPSm" if gpsm else "GPS"
        ret = OrderedDict(
            {
                "densepose": {
                    f"AP-{key}": 100 * stats["AP"],
                    f"AP50-{key}": 100 * stats["AP50"],
                    f"AP75-{key}": 100 * stats["AP75"],
                }
            }
        )
        logger.info(ret)
        return ret

"""COCO detection/segmentation/keypoint mAP evaluation in pure numpy.

This image has no pycocotools; the reference additionally ships a C++
reimplementation (`detectron2/layers/csrc/cocoeval/cocoeval.cpp`, exposed via
`evaluation/fast_eval_api.py`). This module implements the published COCO
evaluation protocol from scratch: greedy per-(image, category) matching over
IoU thresholds .5:.05:.95 with crowd/ignore handling, area ranges, maxDets,
and 101-point interpolated precision accumulation.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.rle import decode_segmentation, rle_area

logger = logging.getLogger(__name__)

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)

OKS_SIGMAS = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
) / 10.0


def box_iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """(D, 4) x (G, 4) XYWH -> (D, G); crowd gt uses intersection/det_area."""
    d = dets.shape[0]
    g = gts.shape[0]
    out = np.zeros((d, g))
    if d == 0 or g == 0:
        return out
    dx0, dy0 = dets[:, 0], dets[:, 1]
    dx1, dy1 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx0, gy0 = gts[:, 0], gts[:, 1]
    gx1, gy1 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    iw = np.clip(np.minimum(dx1[:, None], gx1[None, :]) - np.maximum(dx0[:, None], gx0[None, :]), 0, None)
    ih = np.clip(np.minimum(dy1[:, None], gy1[None, :]) - np.maximum(dy0[:, None], gy0[None, :]), 0, None)
    inter = iw * ih
    da = (dets[:, 2] * dets[:, 3])[:, None]
    ga = (gts[:, 2] * gts[:, 3])[None, :]
    union = np.where(iscrowd[None, :], da, da + ga - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def mask_iou(det_rles: List, gt_rles: List, iscrowd: np.ndarray, h: int, w: int) -> np.ndarray:
    d, g = len(det_rles), len(gt_rles)
    out = np.zeros((d, g))
    if d == 0 or g == 0:
        return out
    from ..data.rle_native import rle_iou_batch

    native = rle_iou_batch(det_rles, gt_rles, iscrowd, h, w)
    if native is not None:
        return native
    det_masks = [decode_segmentation(r, h, w) for r in det_rles]
    gt_masks = [decode_segmentation(r, h, w) for r in gt_rles]
    det_areas = [m.sum() for m in det_masks]
    gt_areas = [m.sum() for m in gt_masks]
    for i, dm in enumerate(det_masks):
        for j, gm in enumerate(gt_masks):
            inter = np.logical_and(dm, gm).sum()
            if iscrowd[j]:
                denom = det_areas[i]
            else:
                denom = det_areas[i] + gt_areas[j] - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def oks_iou(
    dets_kpts: np.ndarray, det_boxes, gts: List[dict], sigmas: Optional[np.ndarray] = None
) -> np.ndarray:
    """Object keypoint similarity (D, G)."""
    d = len(dets_kpts)
    g = len(gts)
    out = np.zeros((d, g))
    if d == 0 or g == 0:
        return out
    vars_ = ((OKS_SIGMAS if sigmas is None else np.asarray(sigmas)) * 2) ** 2
    for j, gt in enumerate(gts):
        gk = np.asarray(gt["keypoints"], dtype=np.float64).reshape(-1, 3)
        xg, yg, vg = gk[:, 0], gk[:, 1], gk[:, 2]
        k1 = int((vg > 0).sum())
        bb = gt["bbox"]
        x0, y0 = bb[0] - bb[2], bb[1] - bb[3]
        x1, y1 = bb[0] + bb[2] * 2, bb[1] + bb[3] * 2
        area = gt.get("area", bb[2] * bb[3])
        for i in range(d):
            dk = np.asarray(dets_kpts[i], dtype=np.float64).reshape(-1, 3)
            xd, yd = dk[:, 0], dk[:, 1]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                dx = np.maximum(0, x0 - xd) + np.maximum(0, xd - x1)
                dy = np.maximum(0, y0 - yd) + np.maximum(0, yd - y1)
            e = (dx**2 + dy**2) / vars_ / (area + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            out[i, j] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] else 0.0
    return out


class COCOEval:
    """Evaluate detections against a COCO-format gt dict.

    ``use_native=True`` (default) routes the greedy matching loops through
    the C++ library in `csrc/cocoeval.cpp` (the reference's fast path,
    fast_eval_api.py) when it builds; otherwise pure numpy/python."""

    def __init__(
        self,
        gt_dataset: Dict,
        iou_type: str = "bbox",
        kpt_oks_sigmas=None,
        use_native: bool = True,
        max_dets: Sequence[int] = MAX_DETS,
        iou_fn=None,
    ):
        """``iou_type="custom"`` runs the full COCO per-threshold matching
        machinery over a caller-supplied similarity matrix: ``iou_fn(dets,
        gts, img_id) -> (D, G)``. Used by DensePose GPS/GPSm (reference
        densepose_coco_evaluation.py:569 computeOgps feeding the standard
        evaluateImg)."""
        assert iou_type in ("bbox", "segm", "keypoints", "custom"), iou_type
        assert (iou_type == "custom") == (iou_fn is not None)
        self.iou_fn = iou_fn
        self.iou_type = iou_type
        self.use_native = use_native
        self.max_dets = tuple(max_dets)
        self.oks_sigmas = (
            np.asarray(kpt_oks_sigmas, dtype=np.float64)
            if kpt_oks_sigmas is not None and len(kpt_oks_sigmas)
            else OKS_SIGMAS
        )
        self.imgs = {img["id"]: img for img in gt_dataset["images"]}
        self.cat_ids = sorted(c["id"] for c in gt_dataset.get("categories", []))
        self._gts = defaultdict(list)
        for ann in gt_dataset.get("annotations", []):
            self._gts[(ann["image_id"], ann["category_id"])].append(ann)

    def evaluate(self, detections: List[Dict], img_ids: Optional[Sequence] = None) -> Dict[str, float]:
        """detections: standard COCO results (image_id, category_id, score,
        bbox / segmentation / keypoints). Returns the 12 standard metrics."""
        if img_ids is None:
            img_ids = sorted(self.imgs.keys())
        img_ids = list(img_ids)

        dts = defaultdict(list)
        for det in detections:
            dts[(det["image_id"], det["category_id"])].append(det)

        t_count = len(IOU_THRS)
        a_names = list(AREA_RNGS.keys())
        k_count = len(self.cat_ids)
        max_det = max(self.max_dets)

        # per (cat, area, img): matches
        native = None
        if self.use_native:
            from .fast_eval_api import get_lib

            native = get_lib()

        eval_imgs = {}
        if native is not None:
            self._evaluate_native(dts, img_ids, a_names, max_det, eval_imgs)
        else:
            for ki, cat_id in enumerate(self.cat_ids):
                for img_id in img_ids:
                    gts = self._gts.get((img_id, cat_id), [])
                    dets = sorted(
                        dts.get((img_id, cat_id), []), key=lambda d: -d["score"]
                    )[:max_det]
                    if len(gts) == 0 and len(dets) == 0:
                        continue
                    ious = self._compute_iou(dets, gts, img_id)
                    for ai, aname in enumerate(a_names):
                        eval_imgs[(ki, ai, img_id)] = self._match(
                            dets, gts, ious, AREA_RNGS[aname]
                        )

        # accumulate
        precision = -np.ones((t_count, len(REC_THRS), k_count, len(a_names), len(self.max_dets)))
        recall = -np.ones((t_count, k_count, len(a_names), len(self.max_dets)))
        for ki in range(k_count):
            for ai in range(len(a_names)):
                for di, md in enumerate(self.max_dets):
                    entries = [
                        eval_imgs.get((ki, ai, img_id)) for img_id in img_ids
                    ]
                    entries = [e for e in entries if e is not None]
                    if not entries:
                        continue
                    scores = np.concatenate([e["scores"][:md] for e in entries])
                    matched = np.concatenate(
                        [e["det_matched"][:, :md] for e in entries], axis=1
                    )
                    det_ignore = np.concatenate(
                        [e["det_ignore"][:, :md] for e in entries], axis=1
                    )
                    n_gt = sum(e["num_gt"] for e in entries)
                    if n_gt == 0:
                        continue
                    order = np.argsort(-scores, kind="mergesort")
                    matched = matched[:, order]
                    det_ignore = det_ignore[:, order]

                    tps = matched & ~det_ignore
                    fps = ~matched & ~det_ignore
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(t_count):
                        tp = tp_sum[ti]
                        fp = fp_sum[ti]
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[ti, ki, ai, di] = rc[-1] if len(rc) else 0
                        # make precision monotone decreasing
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(len(REC_THRS))
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        precision[ti, :, ki, ai, di] = q

        self.precision = precision
        self.recall = recall

        def _summ(ap=True, iou_thr=None, area="all", max_dets=None):
            ai = a_names.index(area)
            di = self.max_dets.index(max_dets if max_dets is not None else self.max_dets[-1])
            if ap:
                s = precision
                if iou_thr is not None:
                    ti = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                    s = s[ti]
                s = s[:, :, :, ai, di]
            else:
                s = recall
                if iou_thr is not None:
                    ti = np.where(np.isclose(IOU_THRS, iou_thr))[0]
                    s = s[ti]
                s = s[:, :, ai, di]
            valid = s[s > -1]
            return float(np.mean(valid)) if valid.size else float("nan")

        if self.iou_type == "keypoints":
            stats = {
                "AP": _summ(True), "AP50": _summ(True, 0.5), "AP75": _summ(True, 0.75),
                "APm": _summ(True, area="medium"), "APl": _summ(True, area="large"),
                "AR": _summ(False), "AR50": _summ(False, 0.5), "AR75": _summ(False, 0.75),
                "ARm": _summ(False, area="medium"), "ARl": _summ(False, area="large"),
            }
        else:
            stats = {
                "AP": _summ(True),
                "AP50": _summ(True, iou_thr=0.5),
                "AP75": _summ(True, iou_thr=0.75),
                "APs": _summ(True, area="small"),
                "APm": _summ(True, area="medium"),
                "APl": _summ(True, area="large"),
                **{f"AR{md}": _summ(False, max_dets=md) for md in self.max_dets},
                "ARs": _summ(False, area="small"),
                "ARm": _summ(False, area="medium"),
                "ARl": _summ(False, area="large"),
            }
        # per-category AP (for the reference's per-category table)
        self.per_category_ap = {}
        for ki, cat_id in enumerate(self.cat_ids):
            s = precision[:, :, ki, 0, len(self.max_dets) - 1]
            valid = s[s > -1]
            self.per_category_ap[cat_id] = float(np.mean(valid)) if valid.size else float("nan")
        return stats

    def _evaluate_native(self, dts, img_ids, a_names, max_det, eval_imgs):
        """Batch every (cat, img, area) triple through the C matcher."""
        from .fast_eval_api import native_match_batch

        pair_ious, gt_ig_l, gt_crowd_l, det_oor_l = [], [], [], []
        meta = []
        for ki, cat_id in enumerate(self.cat_ids):
            for img_id in img_ids:
                gts = self._gts.get((img_id, cat_id), [])
                dets = sorted(
                    dts.get((img_id, cat_id), []), key=lambda d: -d["score"]
                )[:max_det]
                if len(gts) == 0 and len(dets) == 0:
                    continue
                ious = self._compute_iou(dets, gts, img_id)
                det_areas = np.asarray([self._det_area(d) for d in dets])
                scores = np.asarray([d["score"] for d in dets])
                gt_areas = np.asarray([self._gt_area(g) for g in gts])
                gt_base_ignore = np.asarray(
                    [bool(g.get("ignore", False)) or bool(g.get("iscrowd", 0)) for g in gts]
                )
                gt_crowd = np.asarray([bool(g.get("iscrowd", 0)) for g in gts])
                for ai, aname in enumerate(a_names):
                    lo, hi = AREA_RNGS[aname]
                    gt_ignore = gt_base_ignore | ~((gt_areas >= lo) & (gt_areas < hi)) if len(gts) else gt_base_ignore
                    order = np.argsort(gt_ignore, kind="mergesort") if len(gts) else np.zeros(0, int)
                    pair_ious.append(
                        np.ascontiguousarray(ious[:, order], dtype=np.float64)
                        if len(gts)
                        else np.zeros((len(dets), 0), np.float64)
                    )
                    gt_ig_l.append(gt_ignore[order] if len(gts) else np.zeros(0, bool))
                    gt_crowd_l.append(gt_crowd[order] if len(gts) else np.zeros(0, bool))
                    det_oor_l.append((det_areas < lo) | (det_areas >= hi) if len(dets) else np.zeros(0, bool))
                    meta.append(
                        (ki, ai, img_id, scores, int((~gt_ignore).sum()) if len(gts) else 0)
                    )

        if not meta:
            return
        det_matched, det_ignore, det_offsets = native_match_batch(
            pair_ious, gt_ig_l, gt_crowd_l, det_oor_l, IOU_THRS
        )
        for i, (ki, ai, img_id, scores, num_gt) in enumerate(meta):
            d0, d1 = int(det_offsets[i]), int(det_offsets[i + 1])
            eval_imgs[(ki, ai, img_id)] = {
                "scores": scores,
                "det_matched": det_matched[:, d0:d1],
                "det_ignore": det_ignore[:, d0:d1],
                "num_gt": num_gt,
            }

    def _compute_iou(self, dets: List[dict], gts: List[dict], img_id) -> np.ndarray:
        if self.iou_type == "custom":
            return np.asarray(self.iou_fn(dets, gts, img_id), dtype=np.float64)
        iscrowd = np.asarray([g.get("iscrowd", 0) for g in gts], dtype=bool)
        if self.iou_type == "bbox":
            d = np.asarray([det["bbox"] for det in dets], dtype=np.float64).reshape(-1, 4)
            g = np.asarray([gt["bbox"] for gt in gts], dtype=np.float64).reshape(-1, 4)
            return box_iou_xywh(d, g, iscrowd)
        if self.iou_type == "segm":
            img = self.imgs[img_id]
            h, w = img["height"], img["width"]
            return mask_iou(
                [det["segmentation"] for det in dets],
                [gt["segmentation"] for gt in gts],
                iscrowd,
                h,
                w,
            )
        return oks_iou(
            [det["keypoints"] for det in dets], None, gts, sigmas=self.oks_sigmas
        )

    def _gt_area(self, gt: dict) -> float:
        if "area" in gt:
            return float(gt["area"])
        if self.iou_type == "segm" and isinstance(gt.get("segmentation"), dict):
            return float(rle_area(gt["segmentation"]))
        bb = gt["bbox"]
        return float(bb[2] * bb[3])

    def _match(self, dets: List[dict], gts: List[dict], ious: np.ndarray, area_rng):
        """Greedy matching for one (img, cat) over all IoU thresholds."""
        t_count = len(IOU_THRS)
        d = len(dets)
        g = len(gts)
        gt_ignore = np.asarray(
            [
                bool(gt.get("ignore", False))
                or bool(gt.get("iscrowd", 0))
                or not (area_rng[0] <= self._gt_area(gt) < area_rng[1])
                for gt in gts
            ],
            dtype=bool,
        )
        # sort gts: non-ignored first (matching prefers real gt)
        g_order = np.argsort(gt_ignore, kind="mergesort")
        ious_sorted = ious[:, g_order] if g else ious
        gt_ignore_sorted = gt_ignore[g_order] if g else gt_ignore
        iscrowd_sorted = (
            np.asarray([gts[i].get("iscrowd", 0) for i in g_order], dtype=bool)
            if g
            else np.zeros(0, bool)
        )

        det_matched = np.zeros((t_count, d), dtype=bool)
        det_ignore = np.zeros((t_count, d), dtype=bool)
        scores = np.asarray([det["score"] for det in dets])

        for ti, thr in enumerate(IOU_THRS):
            gt_used = np.zeros(g, dtype=bool)
            for di in range(d):
                best_iou = min(thr, 1 - 1e-10)
                best_g = -1
                for gi in range(g):
                    if gt_used[gi] and not iscrowd_sorted[gi]:
                        continue
                    # stop at ignored gt if a real match was already found
                    if best_g > -1 and not gt_ignore_sorted[best_g] and gt_ignore_sorted[gi]:
                        break
                    if ious_sorted[di, gi] < best_iou:
                        continue
                    best_iou = ious_sorted[di, gi]
                    best_g = gi
                if best_g == -1:
                    continue
                gt_used[best_g] = True
                det_matched[ti, di] = True
                det_ignore[ti, di] = gt_ignore_sorted[best_g]

        # unmatched dets outside the area range are ignored
        det_areas = np.asarray([self._det_area(det) for det in dets])
        out_of_rng = (det_areas < area_rng[0]) | (det_areas >= area_rng[1])
        det_ignore = det_ignore | (~det_matched & out_of_rng[None, :])

        return {
            "scores": scores,
            "det_matched": det_matched,
            "det_ignore": det_ignore,
            "num_gt": int((~gt_ignore).sum()),
        }

    def _det_area(self, det: dict) -> float:
        if self.iou_type == "segm":
            return float(rle_area(det["segmentation"]))
        bb = det["bbox"]
        return float(bb[2] * bb[3])

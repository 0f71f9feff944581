"""WSL data plumbing: MCG segmentation-proposal ingestion with superpixels.

Reference: projects/WSL/wsl/data/detection_utils.py:266
(``transform_proposals_seg`` — loads MCG boxes + a superpixel label map +
per-proposal one-hot superpixel membership, applies geometric transforms),
wsl/data/build.py (SP loader variants), tools/proposal_convert.py (MCG .mat
-> pickle).

Static-shape outputs: proposals (R_max, 4), superpixels (H, W) int32 with
-size-bounded ids, oh_labels (R_max, S_max) bool.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data import transforms as T
from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..structures import BoxMode

logger = logging.getLogger(__name__)


def load_mcg_proposals(path: str) -> Dict:
    """Load a converted MCG pickle: {ids, boxes, superpixels?, labels?}."""
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def convert_mcg_mat_to_pickle(mat_dir: str, out_path: str, image_ids: List) -> None:
    """MCG .mat -> pickle (reference tools/proposal_convert.py). Requires
    scipy.io; boxes stored as (y1, x1, y2, x2) 1-indexed in MCG."""
    from scipy.io import loadmat

    ids, all_boxes, all_scores = [], [], []
    for image_id in image_ids:
        mat = loadmat(os.path.join(mat_dir, f"{image_id}.mat"))
        boxes = mat["boxes"].astype(np.float64)
        # MCG: (y1, x1, y2, x2), 1-indexed -> XYXY 0-indexed
        boxes = boxes[:, [1, 0, 3, 2]] - 1
        scores = mat["scores"].reshape(-1).astype(np.float32)
        ids.append(image_id)
        all_boxes.append(boxes.astype(np.float32))
        all_scores.append(scores)
    with open(out_path, "wb") as f:
        pickle.dump(
            {"ids": ids, "boxes": all_boxes, "objectness_logits": all_scores,
             "bbox_mode": int(BoxMode.XYXY_ABS)},
            f,
        )


def convert_mcg_seg_mat_to_pickle(mat_dir: str, out_path: str, image_ids: List) -> None:
    """MCG segment-proposal .mat -> aggregate pickle with superpixel maps +
    per-proposal one-hot membership (reference tools/proposal_convert.py
    ``convert_mcg_seg_i``: mat keys ``superpixels`` (HxW, 1-based),
    ``labels`` (per-proposal 1-based superpixel id lists), ``scores``;
    proposal boxes are the XYXY extents of the member superpixels)."""
    from scipy.io import loadmat

    ids, all_boxes, all_scores, all_sp, all_oh = [], [], [], [], []
    for image_id in image_ids:
        mat = loadmat(os.path.join(mat_dir, f"{image_id}.mat"))
        superpixels = np.asarray(mat["superpixels"]).astype(np.int32) - 1
        labels = mat["labels"].ravel()
        scores = np.asarray(mat["scores"]).reshape(-1).astype(np.float32)
        mask_h, mask_w = superpixels.shape
        num_proposals = len(labels)
        num_superpixels = int(superpixels.max()) + 1

        poses = [np.where(superpixels == sp_id) for sp_id in range(num_superpixels)]
        boxes = np.zeros((num_proposals, 4), np.float32)
        oh = np.zeros((num_proposals, num_superpixels), bool)
        for j in range(num_proposals):
            x1, y1, x2, y2 = mask_w - 1, mask_h - 1, 0, 0
            for sp_id in np.asarray(labels[j]).reshape(-1):
                sp_id = int(sp_id) - 1  # 1-based -> 0-based
                oh[j, sp_id] = True
                ys, xs = poses[sp_id]
                y1 = min(y1, ys.min())
                x1 = min(x1, xs.min())
                y2 = max(y2, ys.max())
                x2 = max(x2, xs.max())
            boxes[j] = (x1, y1, x2, y2)
        ids.append(image_id)
        all_boxes.append(boxes)
        all_scores.append(scores)
        all_sp.append(superpixels)
        all_oh.append(oh)
    with open(out_path, "wb") as f:
        pickle.dump(
            {
                "ids": ids,
                "boxes": all_boxes,
                "objectness_logits": all_scores,
                "superpixels": all_sp,
                "oh_labels": all_oh,
                "bbox_mode": int(BoxMode.XYXY_ABS),
            },
            f,
        )


def transform_proposals_seg(
    dataset_dict: dict,
    image_shape: Tuple[int, int],
    transforms,
    *,
    proposal_topk: int,
    max_superpixels: int = 1024,
    min_box_size: float = 0.0,
) -> None:
    """Apply geometric transforms to MCG boxes + superpixel map + membership
    (reference wsl/data/detection_utils.py:266-343). Mutates dataset_dict,
    adding 'proposals' {boxes, objectness_logits, superpixels, oh_labels}."""
    if "proposal_boxes" not in dataset_dict:
        return
    boxes = BoxMode.convert(
        np.asarray(dataset_dict.pop("proposal_boxes")),
        dataset_dict.pop("proposal_bbox_mode", BoxMode.XYXY_ABS),
        BoxMode.XYXY_ABS,
    )
    boxes = transforms.apply_box(boxes)
    boxes = np.clip(boxes, [0, 0, 0, 0], [image_shape[1], image_shape[0]] * 2)
    logits = np.asarray(dataset_dict.pop("proposal_objectness_logits"))

    superpixels = dataset_dict.pop("proposal_superpixels", None)
    oh_labels = dataset_dict.pop("proposal_oh_labels", None)

    keep = ((boxes[:, 2] - boxes[:, 0]) > min_box_size) & (
        (boxes[:, 3] - boxes[:, 1]) > min_box_size
    )
    boxes, logits = boxes[keep], logits[keep]
    if oh_labels is not None:
        oh_labels = np.asarray(oh_labels)[keep]

    order = np.argsort(-logits)[:proposal_topk]
    out = {
        "boxes": boxes[order].astype(np.float32),
        "objectness_logits": logits[order].astype(np.float32),
    }
    if superpixels is not None:
        sp = np.asarray(superpixels).astype(np.int32)
        sp = transforms.apply_segmentation(sp)
        sp = np.clip(sp, 0, max_superpixels - 1)
        out["superpixels"] = sp
    if oh_labels is not None:
        oh = oh_labels[order]
        s = oh.shape[1]
        if s < max_superpixels:
            oh = np.pad(oh, ((0, 0), (0, max_superpixels - s)))
        else:
            oh = oh[:, :max_superpixels]
        out["oh_labels"] = oh.astype(bool)
    dataset_dict["proposals"] = out


def compute_superpixels_grid(h: int, w: int, cell: int = 16) -> np.ndarray:
    """Fallback superpixel map: a regular grid (used when MCG superpixels are
    unavailable; also handy for tests)."""
    yy = np.arange(h)[:, None] // cell
    xx = np.arange(w)[None, :] // cell
    ncols = (w + cell - 1) // cell
    return (yy * ncols + xx).astype(np.int32)


def oh_labels_from_boxes(
    boxes: np.ndarray, superpixels: np.ndarray, max_superpixels: int
) -> np.ndarray:
    """Membership of each superpixel in each box (by the superpixel's
    centroid): fallback when MCG per-proposal segment membership is absent."""
    s = int(superpixels.max()) + 1
    s = min(s, max_superpixels)
    ys, xs = np.mgrid[0 : superpixels.shape[0], 0 : superpixels.shape[1]]
    flat = superpixels.reshape(-1)
    cnt = np.bincount(flat, minlength=s)[:s].astype(np.float64)
    cy = np.bincount(flat, weights=ys.reshape(-1), minlength=s)[:s] / np.maximum(cnt, 1)
    cx = np.bincount(flat, weights=xs.reshape(-1), minlength=s)[:s] / np.maximum(cnt, 1)
    r = boxes.shape[0]
    oh = np.zeros((r, max_superpixels), dtype=bool)
    inside = (
        (cx[None, :] >= boxes[:, 0:1])
        & (cy[None, :] >= boxes[:, 1:2])
        & (cx[None, :] <= boxes[:, 2:3])
        & (cy[None, :] <= boxes[:, 3:4])
    )
    oh[:, :s] = inside
    return oh


def add_wsl_batch_fields(
    batch: Dict[str, np.ndarray], per_image: List[dict], max_superpixels: int
) -> None:
    """Collate superpixels/oh_labels into the static batch (companion to
    data.detection_utils.build_static_batch)."""
    b = batch["image"].shape[0]
    bh, bw = batch["image"].shape[1:3]
    r = batch["proposals"].shape[1]
    batch["superpixels"] = np.zeros((b, bh, bw), np.int32)
    batch["oh_labels"] = np.zeros((b, r, max_superpixels), bool)
    for i, d in enumerate(per_image):
        p = d.get("proposals", {})
        sp = p.get("superpixels")
        if sp is None:
            h, w = d["image"].shape[:2]
            sp = compute_superpixels_grid(h, w)
        hh, ww = sp.shape
        batch["superpixels"][i, :hh, :ww] = np.clip(sp, 0, max_superpixels - 1)
        oh = p.get("oh_labels")
        if oh is None and "boxes" in p:
            oh = oh_labels_from_boxes(p["boxes"], sp, max_superpixels)
        if oh is not None:
            n = min(len(oh), r)
            batch["oh_labels"][i, :n] = oh[:n, :max_superpixels]


# ---------------------------------------------------------------------------
# VOC datasets (reference wsl/data/datasets/builtin.py:45-166). The loader
# itself is core (data/datasets/pascal_voc.py, matching the reference layout);
# re-exported here for the WSL registration paths below.
# ---------------------------------------------------------------------------

from ..data.datasets.pascal_voc import (  # noqa: E402
    VOC_CLASS_NAMES,
    load_voc_instances,
    register_pascal_voc,
)


def load_mcg_proposals_into_dataset(dataset_dicts, proposal_file):
    """Like data.build.load_proposals_into_dataset but also attaches the MCG
    superpixel label map and the per-proposal one-hot membership when the
    pickle carries them (reference wsl/data/build.py SP loaders +
    wsl/data/detection_utils.py:291-343)."""
    proposals = load_mcg_proposals(os.path.expandvars(proposal_file))

    rename_keys = {"indexes": "ids", "scores": "objectness_logits"}
    for key in rename_keys:
        if key in proposals:
            proposals[rename_keys[key]] = proposals.pop(key)

    img_ids = {str(record["image_id"]) for record in dataset_dicts}
    id_to_index = {
        str(id): i for i, id in enumerate(proposals["ids"]) if str(id) in img_ids
    }
    bbox_mode = (
        BoxMode(proposals["bbox_mode"])
        if "bbox_mode" in proposals
        else BoxMode.XYXY_ABS
    )
    for record in dataset_dicts:
        i = id_to_index[str(record["image_id"])]
        record["proposal_boxes"] = proposals["boxes"][i]
        record["proposal_objectness_logits"] = proposals["objectness_logits"][i]
        record["proposal_bbox_mode"] = bbox_mode
        if "superpixels" in proposals:
            record["proposal_superpixels"] = proposals["superpixels"][i]
        if "oh_labels" in proposals:
            record["proposal_oh_labels"] = proposals["oh_labels"][i]
    return dataset_dicts


class WSLDatasetMapper:
    """DatasetMapper variant whose proposal step also transforms the MCG
    superpixel map + membership (reference wsl/data/dataset_mapper.py →
    detection_utils.py:266 ``transform_proposals_seg``)."""

    def __init__(self, cfg, is_train: bool):
        from ..data.dataset_mapper import DatasetMapper

        class _Mapper(DatasetMapper):
            def __init__(self, *a, max_superpixels=1024, **kw):
                super().__init__(*a, **kw)
                self.max_superpixels = max_superpixels

            def _transform_proposals(self, dataset_dict, image_shape, transforms):
                transform_proposals_seg(
                    dataset_dict,
                    image_shape,
                    transforms,
                    proposal_topk=self.proposal_topk,
                    max_superpixels=self.max_superpixels,
                )

        kwargs = _Mapper.from_config(cfg, is_train)
        kwargs["max_superpixels"] = cfg.WSL.MAX_SUPERPIXELS
        self._mapper = _Mapper(**kwargs)

    def __call__(self, dataset_dict):
        return self._mapper(dataset_dict)


class WSLStaticBatchLoader:
    """StaticBatchLoader wrapper that collates superpixels + oh_labels into
    the batch (reference wsl/data/build.py SP loader variants)."""

    def __init__(self, base_loader, max_superpixels: int):
        self.base = base_loader
        self.max_superpixels = max_superpixels
        # monkey-wrap the collate
        orig = base_loader._collate

        def collate(group):
            batch = orig(group)
            add_wsl_batch_fields(batch, group, self.max_superpixels)
            return batch

        base_loader._collate = collate

    def __iter__(self):
        return iter(self.base)

    def __len__(self):
        return len(self.base)


def build_wsl_train_loader(cfg, mapper=None):
    """WSL train loader: precomputed proposals + superpixel fields. With
    WSL.SP_ON the MCG pickle loader attaches per-image superpixel maps +
    membership, the mapper transforms them geometrically
    (transform_proposals_seg), and the collate adds the static
    ``superpixels``/``oh_labels`` batch fields (grid/centroid fallbacks cover
    pickles without superpixels)."""
    from ..data import build_detection_train_loader

    sp = cfg.WSL.SP_ON
    if sp and mapper is None:
        mapper = WSLDatasetMapper(cfg, True)
    base = build_detection_train_loader(
        cfg, mapper, proposal_loader=load_mcg_proposals_into_dataset if sp else None
    )
    if sp:
        return WSLStaticBatchLoader(base, cfg.WSL.MAX_SUPERPIXELS)
    return base


def build_wsl_test_loader(cfg, dataset_name, mapper=None):
    from ..data import build_detection_test_loader

    sp = cfg.WSL.SP_ON
    if sp and mapper is None:
        mapper = WSLDatasetMapper(cfg, False)
    base = build_detection_test_loader(
        cfg,
        dataset_name,
        mapper,
        proposal_loader=load_mcg_proposals_into_dataset if sp else None,
    )
    if sp:
        return WSLStaticBatchLoader(base, cfg.WSL.MAX_SUPERPIXELS)
    return base

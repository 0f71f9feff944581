"""DensePose data plumbing (reference: projects/DensePose/densepose/data —
loads IUV point annotations and combined loaders).

Static-batch format (per image): annotated person GTs carry up to P_max
sampled surface points:
  gt_dp_coords (G, P, 2)  normalized within-gt-box (x, y)
  gt_dp_patch  (G, P)     patch index 1..24 (0 = background)
  gt_dp_u/v    (G, P)     UV coordinates
  gt_dp_valid  (G, P)
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from jtsm_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from jtsm_tpu.data.dataset_mapper import DatasetMapper
from jtsm_tpu.data.datasets.coco import load_coco_json


def load_densepose_annotations(json_file: str, image_root: str, dataset_name=None):
    """COCO-DensePose json: standard instances + dp_* fields per annotation."""
    dicts = load_coco_json(
        json_file,
        image_root,
        dataset_name,
        extra_annotation_keys=["dp_x", "dp_y", "dp_I", "dp_U", "dp_V", "dp_masks"],
    )
    return dicts


def register_densepose(name: str, json_file: str, image_root: str) -> None:
    DatasetCatalog.register(
        name, lambda: load_densepose_annotations(json_file, image_root, name)
    )
    MetadataCatalog.get(name).set(
        json_file=json_file,
        image_root=image_root,
        evaluator_type="densepose",
        thing_classes=["person"],
    )


def register_builtin(root: str = None) -> None:
    """Lazy builtin registration under $JTSM_DATASETS (reference
    densepose/data/datasets/builtin.py): the real COCO-DensePose splits,
    plus the offline synthetic split fabricated by
    dev/make_synthetic_coco.py (densepose_synth_100.json over the rendered
    val2017 scenes) that the quick-schedule gate trains on."""
    import os

    root = root or os.environ.get("JTSM_DATASETS", "datasets")
    splits = {
        "densepose_coco_2014_minival": (
            "coco/annotations/densepose_minival2014.json",
            "coco/val2014",
        ),
        "densepose_coco_2014_minival_100": (
            "coco/annotations/densepose_minival2014_100.json",
            "coco/val2014",
        ),
        "densepose_coco_synth_100": (
            "coco/annotations/densepose_synth_100.json",
            "coco/val2017",
        ),
    }
    for name, (json_file, image_root) in splits.items():
        if name not in DatasetCatalog:
            register_densepose(
                name, os.path.join(root, json_file), os.path.join(root, image_root)
            )


register_builtin()


def densepose_targets_from_annotations(
    annos: List[dict], gt_boxes: np.ndarray, max_points: int = 196
) -> Dict[str, np.ndarray]:
    """Per-gt static point targets. dp_x/dp_y are in 256-normalized gt-box
    coords in the COCO-DensePose format."""
    g = len(gt_boxes)
    out = {
        "gt_dp_coords": np.zeros((g, max_points, 2), np.float32),
        "gt_dp_patch": np.zeros((g, max_points), np.int32),
        "gt_dp_u": np.zeros((g, max_points), np.float32),
        "gt_dp_v": np.zeros((g, max_points), np.float32),
        "gt_dp_valid": np.zeros((g, max_points), bool),
    }
    for i, ann in enumerate(annos[:g]):
        if "dp_x" not in ann:
            continue
        xs = np.asarray(ann["dp_x"], np.float32) / 256.0
        ys = np.asarray(ann["dp_y"], np.float32) / 256.0
        n = min(len(xs), max_points)
        out["gt_dp_coords"][i, :n, 0] = xs[:n]
        out["gt_dp_coords"][i, :n, 1] = ys[:n]
        out["gt_dp_patch"][i, :n] = np.asarray(ann["dp_I"], np.int32)[:n]
        out["gt_dp_u"][i, :n] = np.asarray(ann["dp_U"], np.float32)[:n]
        out["gt_dp_v"][i, :n] = np.asarray(ann["dp_V"], np.float32)[:n]
        out["gt_dp_valid"][i, :n] = True
    return out


class DatasetMapperDensePose(DatasetMapper):
    """DatasetMapper that threads the dp_* surface-point annotations into
    the static batch (reference densepose/data/dataset_mapper.py): per-gt
    point targets attach as ``gt_dp_*`` Instances fields (sliced by the
    same empty-filter as every gt field, padded/collated by
    build_static_batch), so DensePoseROIHeads sees its training targets
    from the REAL data path, not just unit-test fixtures.

    dp_x/dp_y are gt-box-relative (0..255), so scaling transforms need no
    point update. Horizontal flips mirror x, swap the left/right part
    labels (DP_HFLIP_PART_SWAP) and mirror U; the reference additionally
    remaps U/V through per-part SMPL mirror tables (UV_symmetry_*.mat,
    downloaded at runtime — not redistributable here), so flipped-point UV
    supervision is approximate. Datasets that need exact parity should
    train with INPUT.RANDOM_FLIP "none"."""

    max_dp_points = 196  # overridden from cfg by Trainer.build_train_loader

    def _attach_extra_annotations(self, annos, instances, image_shape, transforms):
        if not any("dp_x" in a for a in annos):
            return
        from jtsm_tpu.data.transforms import HFlipTransform

        flipped = any(isinstance(t, HFlipTransform) for t in transforms.transforms)
        if flipped:
            from .converters import DP_HFLIP_PART_SWAP

            swap = np.arange(25)
            for s, d in DP_HFLIP_PART_SWAP.items():
                swap[s] = d
            annos = [dict(a) for a in annos]
            for a in annos:
                if "dp_x" not in a:
                    continue
                a["dp_x"] = (255.0 - np.asarray(a["dp_x"], np.float32)).tolist()
                a["dp_I"] = swap[np.asarray(a["dp_I"], int)].tolist()
                a["dp_U"] = (1.0 - np.asarray(a["dp_U"], np.float32)).tolist()
        targets = densepose_targets_from_annotations(
            annos, np.asarray(instances.gt_boxes), max_points=self.max_dp_points
        )
        for k, v in targets.items():
            setattr(instances, k, v)


def apply_category_maps(dataset_dicts, category_map):
    """Remap annotation category ids (reference data/utils.py /
    build.py combined-loader category mapping; cfg key
    DATASETS.CATEGORY_MAPS). category_map: {src_id (str|int): dst_id}."""
    cmap = {int(k): int(v) for k, v in dict(category_map).items()}
    for entry in dataset_dicts:
        for ann in entry.get("annotations", []):
            cid = int(ann.get("category_id", -1))
            if cid in cmap:
                ann["category_id"] = cmap[cid]
    return dataset_dicts


def filter_whitelisted_categories(dataset_dicts, whitelist):
    """Keep only annotations whose category is whitelisted (reference
    cfg key DATASETS.WHITELISTED_CATEGORIES)."""
    allowed = {int(c) for c in whitelist}
    for entry in dataset_dicts:
        entry["annotations"] = [
            a
            for a in entry.get("annotations", [])
            if int(a.get("category_id", -1)) in allowed
        ]
    return dataset_dicts

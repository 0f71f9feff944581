"""Builtin WSL/JTSM dataset registration (reference
projects/WSL/wsl/data/datasets/builtin.py:38-166 + builtin_meta.py:289).

Registers (paths under $JTSM_DATASETS, default ./datasets):
- web image-level data:      flickr_voc, flickr_coco
- VOC07 pseudo-GT:           voc_2007_{train,val}_pgt
- VOC12+SBD instances:       voc_2012_{train,val}_instance, sbd_9118_instance
                             (+ ``_pgt`` mined-label variants)
- VOC12+SBD panoptic:        {split}_panoptic_separated (PanopticFPN format)
                             via the jsons/PNGs written by
                             projects/WSL/tools/convert_voc2012_and_sbd_*.py
"""

from __future__ import annotations

import os

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..data.datasets.builtin import register_coco_panoptic_separated
from ..data.datasets.coco import register_coco_instances
from .data import VOC_CLASS_NAMES
from .voc_sbd import VOC_CATEGORIES

COCO80 = None  # loaded lazily from core builtin_meta when needed


def _voc_sbd_instances_meta() -> dict:
    things = [c for c in VOC_CATEGORIES if c["isthing"]]
    return {
        "thing_classes": [c["name"] for c in things],
        "thing_colors": [c["color"] for c in things],
        "thing_dataset_id_to_contiguous_id": {c["id"]: i for i, c in enumerate(things)},
    }


def _voc_sbd_panoptic_separated_meta() -> dict:
    stuff = [c for c in VOC_CATEGORIES if not c["isthing"]]
    ret = {
        "stuff_classes": ["things"] + [c["name"] for c in stuff],
        "stuff_colors": [[82, 18, 128]] + [c["color"] for c in stuff],
        "stuff_dataset_id_to_contiguous_id": {c["id"]: i + 1 for i, c in enumerate(stuff)},
        "ignore_label": 255,
    }
    ret.update(_voc_sbd_instances_meta())
    return ret


_SPLITS_WEB = {
    "flickr_voc": ("flickr_voc/images", "flickr_voc/images_d2.json", "voc"),
    "flickr_coco": ("flickr_coco/images", "flickr_coco/images_d2.json", "coco"),
}

_SPLITS_VOC_PGT = {
    "voc_2007_train_pgt": (
        "VOC2007/JPEGImages",
        "VOC2007/annotations/voc_2007_train_pgt.json",
    ),
    "voc_2007_val_pgt": (
        "VOC2007/JPEGImages",
        "VOC2007/annotations/voc_2007_val_pgt.json",
    ),
}

_SPLITS_VOC_SBD = {
    "voc_2012_train_instance": "voc_2012_train_instance.json",
    "voc_2012_val_instance": "voc_2012_val_instance.json",
    "sbd_9118_instance": "sbd_9118_instance.json",
    "voc_2012_train_instance_pgt": "voc_2012_train_instance_pgt.json",
    "sbd_9118_instance_pgt": "sbd_9118_instance_pgt.json",
}

_SPLITS_VOC_SBD_PANOPTIC = ("voc_2012_train", "voc_2012_val", "sbd_9118")


def _flickr_meta(kind: str) -> dict:
    if kind == "voc":
        return {
            "thing_classes": list(VOC_CLASS_NAMES),
            "thing_dataset_id_to_contiguous_id": {i + 1: i for i in range(20)},
        }
    from ..data.datasets.builtin_meta import _get_coco_instances_meta

    return _get_coco_instances_meta()


def register_all_web(root: str) -> None:
    for name, (image_root, json_file, kind) in _SPLITS_WEB.items():
        if name in DatasetCatalog:
            continue
        register_coco_instances(
            name,
            _flickr_meta(kind),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )


def register_all_voc_pgt(root: str) -> None:
    for name, (image_root, json_file) in _SPLITS_VOC_PGT.items():
        if name in DatasetCatalog:
            continue
        register_coco_instances(
            name,
            _flickr_meta("voc"),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )


def register_all_voc_sbd(root: str) -> None:
    base = os.path.join(root, "VOC_SBD")
    for name, json_name in _SPLITS_VOC_SBD.items():
        if name in DatasetCatalog:
            continue
        register_coco_instances(
            name,
            _voc_sbd_instances_meta(),
            os.path.join(base, "annotations", json_name),
            os.path.join(base, "images"),
        )
    for split in _SPLITS_VOC_SBD_PANOPTIC:
        name = f"{split}_panoptic"
        if name + "_separated" in DatasetCatalog:
            continue
        register_coco_panoptic_separated(
            name,
            _voc_sbd_panoptic_separated_meta(),
            image_root=os.path.join(base, "images"),
            panoptic_root=os.path.join(base, "annotations", "panoptic"),
            panoptic_json=os.path.join(base, "annotations", f"{split}_panoptic.json"),
            sem_seg_root=os.path.join(base, "annotations", "panoptic_stuff"),
            instances_json=os.path.join(base, "annotations", f"{split}_instance.json"),
        )
        # also expose standard-format metadata for PQ evaluation
        MetadataCatalog.get(name + "_separated").set(
            thing_colors=[c["color"] for c in VOC_CATEGORIES if c["isthing"]],
        )


def register_all(root: str | None = None) -> None:
    root = root or os.environ.get("JTSM_DATASETS", "datasets")
    register_all_web(root)
    register_all_voc_pgt(root)
    register_all_voc_sbd(root)

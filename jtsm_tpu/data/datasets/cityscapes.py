"""Cityscapes dataset loading (reference:
detectron2/data/datasets/cityscapes.py:53 — fine-annotation instances + sem
seg). The cityscapesscripts package is absent; the gtFine polygon json files
are parsed directly.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List

import numpy as np

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

# the 8 "thing" classes of the cityscapes instance benchmark
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]
CITYSCAPES_STUFF_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]


def _files_in_split(image_dir: str, gt_dir: str):
    for city in sorted(os.listdir(image_dir)):
        city_img_dir = os.path.join(image_dir, city)
        if not os.path.isdir(city_img_dir):
            continue
        for basename in sorted(os.listdir(city_img_dir)):
            if not basename.endswith("_leftImg8bit.png"):
                continue
            prefix = basename[: -len("_leftImg8bit.png")]
            yield (
                os.path.join(city_img_dir, basename),
                os.path.join(gt_dir, city, prefix + "_gtFine_polygons.json"),
                os.path.join(gt_dir, city, prefix + "_gtFine_labelIds.png"),
            )


def load_cityscapes_instances(image_dir: str, gt_dir: str) -> List[dict]:
    dataset_dicts = []
    for img_file, poly_file, label_file in _files_in_split(image_dir, gt_dir):
        if not os.path.exists(poly_file):
            continue
        with open(poly_file) as f:
            poly = json.load(f)
        record = {
            "file_name": img_file,
            "image_id": os.path.basename(img_file)[: -len("_leftImg8bit.png")],
            "height": poly["imgHeight"],
            "width": poly["imgWidth"],
        }
        annos = []
        for obj in poly.get("objects", []):
            label = obj["label"]
            if label.endswith("group"):
                label = label[: -len("group")]
                iscrowd = 1
            else:
                iscrowd = 0
            if label not in CITYSCAPES_THING_CLASSES:
                continue
            pts = np.asarray(obj["polygon"], dtype=np.float64).reshape(-1)
            if pts.size < 6:
                continue
            xs, ys = pts[0::2], pts[1::2]
            annos.append(
                {
                    "category_id": CITYSCAPES_THING_CLASSES.index(label),
                    "bbox": [xs.min(), ys.min(), xs.max(), ys.max()],
                    "bbox_mode": BoxMode.XYXY_ABS,
                    "segmentation": [pts.tolist()],
                    "iscrowd": iscrowd,
                }
            )
        record["annotations"] = annos
        dataset_dicts.append(record)
    return dataset_dicts


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    dataset_dicts = []
    for img_file, poly_file, label_file in _files_in_split(image_dir, gt_dir):
        if not os.path.exists(label_file):
            continue
        dataset_dicts.append(
            {"file_name": img_file, "sem_seg_file_name": label_file}
        )
    return dataset_dicts


def register_cityscapes(root: str) -> None:
    for split in ("train", "val", "test"):
        img_dir = os.path.join(root, "cityscapes", "leftImg8bit", split)
        gt_dir = os.path.join(root, "cityscapes", "gtFine", split)
        inst_name = f"cityscapes_fine_instance_seg_{split}"
        if inst_name not in DatasetCatalog:
            DatasetCatalog.register(
                inst_name,
                lambda i=img_dir, g=gt_dir: load_cityscapes_instances(i, g),
            )
            MetadataCatalog.get(inst_name).set(
                thing_classes=list(CITYSCAPES_THING_CLASSES),
                evaluator_type="cityscapes_instance",
                image_dir=img_dir,
                gt_dir=gt_dir,
            )
        sem_name = f"cityscapes_fine_sem_seg_{split}"
        if sem_name not in DatasetCatalog:
            DatasetCatalog.register(
                sem_name,
                lambda i=img_dir, g=gt_dir: load_cityscapes_semantic(i, g),
            )
            MetadataCatalog.get(sem_name).set(
                stuff_classes=list(CITYSCAPES_STUFF_CLASSES),
                evaluator_type="cityscapes_sem_seg",
                ignore_label=255,
                image_dir=img_dir,
                gt_dir=gt_dir,
            )

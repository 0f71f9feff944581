"""LVIS dataset loading (reference: detectron2/data/datasets/lvis.py:40) —
parsed directly from json like the COCO loader."""

from __future__ import annotations

import json
import logging
import os
from collections import defaultdict
from typing import List, Optional

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)


def load_lvis_json(json_file: str, image_root: str, dataset_name: Optional[str] = None):
    with open(json_file) as f:
        lvis = json.load(f)

    if dataset_name is not None:
        meta = get_lvis_instances_meta(lvis)
        MetadataCatalog.get(dataset_name).set(**meta)

    anns_by_image = defaultdict(list)
    for ann in lvis.get("annotations", []):
        anns_by_image[ann["image_id"]].append(ann)

    dataset_dicts = []
    for img in lvis["images"]:
        # LVIS file names embed the coco path in coco_url
        if "file_name" in img:
            file_name = img["file_name"]
            if file_name.startswith("COCO"):
                file_name = file_name[-16:]
        else:
            file_name = img["coco_url"].split("/")[-1]
        record = {
            "file_name": os.path.join(image_root, file_name),
            "height": img["height"],
            "width": img["width"],
            "image_id": img["id"],
            "not_exhaustive_category_ids": img.get("not_exhaustive_category_ids", []),
            "neg_category_ids": img.get("neg_category_ids", []),
        }
        objs = []
        for ann in anns_by_image.get(img["id"], []):
            obj = {
                "bbox": ann["bbox"],
                "bbox_mode": BoxMode.XYWH_ABS,
                "category_id": ann["category_id"] - 1,  # LVIS ids are 1-based
            }
            if "segmentation" in ann:
                segm = [
                    p for p in ann["segmentation"] if len(p) % 2 == 0 and len(p) >= 6
                ]
                obj["segmentation"] = segm
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)
    return dataset_dicts


def get_lvis_instances_meta(lvis_json_dict) -> dict:
    cats = sorted(lvis_json_dict.get("categories", []), key=lambda c: c["id"])
    thing_classes = [c.get("synonyms", [c.get("name", str(c["id"]))])[0] for c in cats]
    return {"thing_classes": thing_classes}


def register_lvis_instances(name: str, metadata: dict, json_file: str, image_root: str):
    DatasetCatalog.register(name, lambda: load_lvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="lvis", **metadata
    )

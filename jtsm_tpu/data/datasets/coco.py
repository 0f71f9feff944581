"""COCO-format dataset loading WITHOUT pycocotools (absent in this image) —
the json is parsed directly; RLE handled by `..rle`.

Reference: detectron2/data/datasets/coco.py:30 (``load_coco_json``), :209
(``load_sem_seg``), :449 (``register_coco_instances``).
"""

from __future__ import annotations

import json
import logging
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)


def load_coco_json(
    json_file: str,
    image_root: str,
    dataset_name: Optional[str] = None,
    extra_annotation_keys: Optional[List[str]] = None,
) -> List[dict]:
    """Reference coco.py:30 — returns the standard list-of-dicts format."""
    with open(json_file, "r") as f:
        coco = json.load(f)

    if dataset_name is not None:
        meta = MetadataCatalog.get(dataset_name)
        cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
        thing_classes = [c["name"] for c in cats]
        meta.thing_classes = thing_classes
        cat_ids = [c["id"] for c in cats]
        id_map = {v: i for i, v in enumerate(cat_ids)}
        meta.thing_dataset_id_to_contiguous_id = id_map
        meta.json_file = json_file
        meta.image_root = image_root
    else:
        cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
        id_map = {c["id"]: i for i, c in enumerate(cats)}

    anns_by_image: Dict[int, List[dict]] = defaultdict(list)
    for ann in coco.get("annotations", []):
        anns_by_image[ann["image_id"]].append(ann)

    ann_keys = ["iscrowd", "bbox", "keypoints", "category_id"] + (
        extra_annotation_keys or []
    )

    dataset_dicts = []
    num_without_valid_segmentation = 0
    for img in coco["images"]:
        record = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "height": img["height"],
            "width": img["width"],
            "image_id": img["id"],
        }
        objs = []
        for ann in anns_by_image.get(img["id"], []):
            obj = {k: ann[k] for k in ann_keys if k in ann}
            segm = ann.get("segmentation")
            if segm is not None:
                if isinstance(segm, dict):
                    if isinstance(segm.get("counts"), list):
                        pass  # uncompressed RLE kept as-is
                else:
                    segm = [p for p in segm if len(p) % 2 == 0 and len(p) >= 6]
                    if len(segm) == 0:
                        num_without_valid_segmentation += 1
                        continue
                obj["segmentation"] = segm
            obj["bbox_mode"] = BoxMode.XYWH_ABS
            if id_map:
                if obj["category_id"] not in id_map:
                    continue
                obj["category_id"] = id_map[obj["category_id"]]
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)

    if num_without_valid_segmentation > 0:
        logger.warning(
            f"Filtered out {num_without_valid_segmentation} instances without valid segmentation."
        )
    return dataset_dicts


def load_sem_seg(gt_root: str, image_root: str, gt_ext="png", image_ext="jpg") -> List[dict]:
    """Reference coco.py:209 — pair images with sem-seg PNGs by basename."""

    def file2id(folder_path, file_path):
        image_id = os.path.normpath(os.path.relpath(file_path, start=folder_path))
        return os.path.splitext(image_id)[0]

    input_files = sorted(
        (os.path.join(image_root, f) for f in _walk(image_root, image_ext)),
        key=lambda p: file2id(image_root, p),
    )
    gt_files = sorted(
        (os.path.join(gt_root, f) for f in _walk(gt_root, gt_ext)),
        key=lambda p: file2id(gt_root, p),
    )
    assert len(gt_files) > 0, f"No annotations found in {gt_root}."
    if len(input_files) != len(gt_files):
        input_basenames = [os.path.basename(f)[: -len(image_ext) - 1] for f in input_files]
        gt_basenames = [os.path.basename(f)[: -len(gt_ext) - 1] for f in gt_files]
        intersect = sorted(set(input_basenames) & set(gt_basenames))
        input_files = [
            os.path.join(image_root, f + "." + image_ext) for f in intersect
        ]
        gt_files = [os.path.join(gt_root, f + "." + gt_ext) for f in intersect]

    dataset_dicts = []
    for img_path, gt_path in zip(input_files, gt_files):
        dataset_dicts.append({"file_name": img_path, "sem_seg_file_name": gt_path})
    return dataset_dicts


def _walk(root, ext):
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(ext):
                yield os.path.relpath(os.path.join(dirpath, f), root)


def register_coco_instances(name: str, metadata: dict, json_file: str, image_root: str):
    """Reference coco.py:449."""
    assert isinstance(name, str), name
    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco", **metadata
    )


def convert_to_coco_dict(dataset_name: str) -> dict:
    """Reference coco.py:306 — dataset dicts -> COCO-format json dict."""
    dataset_dicts = DatasetCatalog.get(dataset_name)
    metadata = MetadataCatalog.get(dataset_name)

    if hasattr(metadata, "thing_dataset_id_to_contiguous_id"):
        reverse_id_mapping = {
            v: k for k, v in metadata.thing_dataset_id_to_contiguous_id.items()
        }
        reverse_id = lambda contiguous_id: reverse_id_mapping[contiguous_id]
    else:
        reverse_id = lambda contiguous_id: contiguous_id

    categories = [
        {"id": reverse_id(i), "name": name}
        for i, name in enumerate(metadata.thing_classes)
    ]
    coco_images = []
    coco_annotations = []
    for image_dict in dataset_dicts:
        coco_image = {
            "id": image_dict.get("image_id", len(coco_images)),
            "width": int(image_dict["width"]),
            "height": int(image_dict["height"]),
            "file_name": str(image_dict["file_name"]),
        }
        coco_images.append(coco_image)
        for annotation in image_dict.get("annotations", []):
            coco_annotation = {}
            bbox = annotation["bbox"]
            if isinstance(bbox, np.ndarray):
                bbox = bbox.tolist()
            bbox_mode = annotation["bbox_mode"]
            # rotated (5-dim) boxes stay XYWHA (reference data/datasets/coco.py:341)
            to_mode = BoxMode.XYWH_ABS if len(bbox) == 4 else BoxMode.XYWHA_ABS
            bbox = BoxMode.convert(bbox, bbox_mode, to_mode)
            coco_annotation["id"] = len(coco_annotations) + 1
            coco_annotation["image_id"] = coco_image["id"]
            coco_annotation["bbox"] = [round(float(x), 3) for x in bbox]
            coco_annotation["area"] = float(abs(bbox[2] * bbox[3]))
            coco_annotation["iscrowd"] = int(annotation.get("iscrowd", 0))
            coco_annotation["category_id"] = int(reverse_id(annotation["category_id"]))
            if "segmentation" in annotation:
                coco_annotation["segmentation"] = annotation["segmentation"]
            if "keypoints" in annotation:
                kpts = np.asarray(annotation["keypoints"]).reshape(-1).tolist()
                coco_annotation["keypoints"] = kpts
                coco_annotation["num_keypoints"] = sum(k > 0 for k in kpts[2::3])
            coco_annotations.append(coco_annotation)

    return {
        "info": {"description": "Automatically generated COCO json file."},
        "images": coco_images,
        "annotations": coco_annotations,
        "categories": categories,
        "licenses": None,
    }


def convert_to_coco_json(dataset_name: str, output_file: str, allow_cached: bool = True):
    """Convert a registered dataset to COCO format and cache it as json
    (reference coco.py:415 — lets COCOEvaluator run on any standard-format
    dataset that has no native json)."""
    d = os.path.dirname(output_file)
    if d:
        os.makedirs(d, exist_ok=True)
    if os.path.exists(output_file) and allow_cached:
        logger.warning(
            f"Using previously cached COCO format annotations at '{output_file}'. "
            "You need to clear the cache file if your dataset has been modified."
        )
        return
    logger.info(f"Converting annotations of dataset '{dataset_name}' to COCO format ...")
    coco_dict = convert_to_coco_dict(dataset_name)
    tmp_file = output_file + ".tmp"
    with open(tmp_file, "w") as f:
        json.dump(coco_dict, f)
    os.replace(tmp_file, output_file)

"""Pascal VOC dataset loading (reference: detectron2/data/datasets/pascal_voc.py:26
``load_voc_instances``, ``register_pascal_voc``). Lives in the core data plane —
the WSL project re-uses it for its VOC registrations (wsl/data.py)."""

from __future__ import annotations

import os

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog
from ...structures import BoxMode

__all__ = ["CLASS_NAMES", "VOC_CLASS_NAMES", "load_voc_instances", "register_pascal_voc"]

# reference pascal_voc.py:15 CLASS_NAMES
CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
VOC_CLASS_NAMES = CLASS_NAMES


def load_voc_instances(dirname: str, split: str):
    """Pascal VOC xml annotations -> dataset dicts
    (reference detectron2/data/datasets/pascal_voc.py:26)."""
    import xml.etree.ElementTree as ET

    with open(os.path.join(dirname, "ImageSets", "Main", split + ".txt")) as f:
        fileids = np.loadtxt(f, dtype=str)

    dicts = []
    for fileid in fileids:
        anno_file = os.path.join(dirname, "Annotations", fileid + ".xml")
        jpeg_file = os.path.join(dirname, "JPEGImages", fileid + ".jpg")
        with open(anno_file) as f:
            tree = ET.parse(f)
        r = {
            "file_name": jpeg_file,
            "image_id": fileid,
            "height": int(tree.findall("./size/height")[0].text),
            "width": int(tree.findall("./size/width")[0].text),
        }
        instances = []
        for obj in tree.findall("object"):
            cls = obj.find("name").text
            difficult = int(obj.find("difficult").text)
            bbox = obj.find("bndbox")
            bbox = [
                float(bbox.find(x).text) for x in ["xmin", "ymin", "xmax", "ymax"]
            ]
            bbox[0] -= 1.0
            bbox[1] -= 1.0
            instances.append(
                {
                    "category_id": CLASS_NAMES.index(cls),
                    "bbox": bbox,
                    "bbox_mode": BoxMode.XYXY_ABS,
                    "difficult": bool(difficult),
                }
            )
        r["annotations"] = instances
        dicts.append(r)
    return dicts


def register_pascal_voc(name: str, dirname: str, split: str, year: int = 2007):
    DatasetCatalog.register(name, lambda: load_voc_instances(dirname, split))
    MetadataCatalog.get(name).set(
        thing_classes=list(CLASS_NAMES),
        dirname=dirname,
        year=year,
        split=split,
        evaluator_type="pascal_voc",
    )

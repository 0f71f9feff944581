from .cityscapes import (
    load_cityscapes_instances,
    load_cityscapes_semantic,
    register_cityscapes,
)
from .coco import (
    convert_to_coco_dict,
    convert_to_coco_json,
    load_coco_json,
    load_sem_seg,
    register_coco_instances,
)
from .builtin import (
    load_coco_panoptic_json,
    merge_to_panoptic,
    register_coco_panoptic,
    register_coco_panoptic_separated,
)
from .lvis import get_lvis_instances_meta, load_lvis_json, register_lvis_instances
from .pascal_voc import load_voc_instances, register_pascal_voc

__all__ = [
    "get_lvis_instances_meta",
    "load_voc_instances",
    "register_pascal_voc",
    "load_coco_json",
    "load_sem_seg",
    "register_coco_instances",
    "convert_to_coco_dict",
    "convert_to_coco_json",
    "load_coco_panoptic_json",
    "merge_to_panoptic",
    "register_coco_panoptic",
    "register_coco_panoptic_separated",
    "load_lvis_json",
    "register_lvis_instances",
    "load_cityscapes_instances",
    "load_cityscapes_semantic",
    "register_cityscapes",
]

# eager builtin-dataset registration on import, matching the reference
# (detectron2/data/datasets/__init__.py imports builtin for its side effect)
from . import builtin as _builtin  # noqa: E402,F401

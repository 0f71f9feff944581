from .cityscapes import (
    load_cityscapes_instances,
    load_cityscapes_semantic,
    register_cityscapes,
)
from .coco import convert_to_coco_dict, load_coco_json, load_sem_seg, register_coco_instances
from .lvis import load_lvis_json, register_lvis_instances

__all__ = [
    "load_coco_json",
    "load_sem_seg",
    "register_coco_instances",
    "convert_to_coco_dict",
    "load_lvis_json",
    "register_lvis_instances",
    "load_cityscapes_instances",
    "load_cityscapes_semantic",
    "register_cityscapes",
]

# eager builtin-dataset registration on import, matching the reference
# (detectron2/data/datasets/__init__.py imports builtin for its side effect)
from . import builtin as _builtin  # noqa: E402,F401

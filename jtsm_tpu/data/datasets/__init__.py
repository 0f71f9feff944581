from .coco import convert_to_coco_dict, load_coco_json, load_sem_seg, register_coco_instances

__all__ = [
    "load_coco_json",
    "load_sem_seg",
    "register_coco_instances",
    "convert_to_coco_dict",
]

"""Eager registration of builtin datasets (reference:
detectron2/data/datasets/builtin.py:106-237). Paths resolve under
$JTSM_DATASETS (default ./datasets); registration is lazy — data is only
read when a dataset is actually used."""

from __future__ import annotations

import os

from ..catalog import DatasetCatalog, MetadataCatalog
from .builtin_meta import _get_builtin_metadata
from .coco import load_coco_json, load_sem_seg, register_coco_instances

_PREDEFINED_SPLITS_COCO = {
    "coco_2017_train": ("coco/train2017", "coco/annotations/instances_train2017.json"),
    "coco_2017_val": ("coco/val2017", "coco/annotations/instances_val2017.json"),
    "coco_2017_val_100": ("coco/val2017", "coco/annotations/instances_val2017_100.json"),
    # synthetic varied-stuff tree (dev/make_synthetic_coco.py cocovar):
    # stuff-band presence cycles per image so weakly-supervised stuff
    # mining has image-level localization signal (JTSM gates)
    "coco_2017_varied_100": (
        "cocovar/val2017",
        "cocovar/annotations/instances_val2017_100.json",
    ),
    "coco_2017_test": ("coco/test2017", "coco/annotations/image_info_test2017.json"),
    "coco_2017_test-dev": (
        "coco/test2017",
        "coco/annotations/image_info_test-dev2017.json",
    ),
    "coco_2014_train": ("coco/train2014", "coco/annotations/instances_train2014.json"),
    "coco_2014_val": ("coco/val2014", "coco/annotations/instances_val2014.json"),
    "coco_2014_minival": ("coco/val2014", "coco/annotations/instances_minival2014.json"),
    "coco_2014_minival_100": (
        "coco/val2014",
        "coco/annotations/instances_minival2014_100.json",
    ),
    "coco_2014_valminusminival": (
        "coco/val2014",
        "coco/annotations/instances_valminusminival2014.json",
    ),
}

_PREDEFINED_SPLITS_COCO_PERSON = {
    "keypoints_coco_2017_train": (
        "coco/train2017",
        "coco/annotations/person_keypoints_train2017.json",
    ),
    "keypoints_coco_2017_val": (
        "coco/val2017",
        "coco/annotations/person_keypoints_val2017.json",
    ),
    "keypoints_coco_2017_val_100": (
        "coco/val2017",
        "coco/annotations/person_keypoints_val2017_100.json",
    ),
}

_PREDEFINED_SPLITS_COCO_PANOPTIC = {
    "coco_2017_train_panoptic": (
        "coco/panoptic_train2017",
        "coco/annotations/panoptic_train2017.json",
        "coco/panoptic_stuff_train2017",
    ),
    "coco_2017_val_panoptic": (
        "coco/panoptic_val2017",
        "coco/annotations/panoptic_val2017.json",
        "coco/panoptic_stuff_val2017",
    ),
    "coco_2017_val_100_panoptic": (
        "coco/panoptic_val2017_100",
        "coco/annotations/panoptic_val2017_100.json",
        "coco/panoptic_stuff_val2017_100",
    ),
    "coco_2017_varied_100_panoptic": (
        "cocovar/panoptic_val2017_100",
        "cocovar/annotations/panoptic_val2017_100.json",
        "cocovar/panoptic_stuff_val2017_100",
    ),
}


def register_all_coco(root: str) -> None:
    for name, (image_root, json_file) in _PREDEFINED_SPLITS_COCO.items():
        if name in DatasetCatalog:
            continue
        register_coco_instances(
            name,
            _get_builtin_metadata("coco"),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )
    for name, (image_root, json_file) in _PREDEFINED_SPLITS_COCO_PERSON.items():
        if name in DatasetCatalog:
            continue
        register_coco_instances(
            name,
            _get_builtin_metadata("coco_person"),
            os.path.join(root, json_file),
            os.path.join(root, image_root),
        )


def register_coco_panoptic_separated(
    name: str,
    metadata: dict,
    image_root: str,
    panoptic_root: str,
    panoptic_json: str,
    sem_seg_root: str,
    instances_json: str,
) -> None:
    """Reference datasets/coco_panoptic.py — the 'separated' panoptic format
    used by PanopticFPN: COCO instances + per-pixel stuff PNGs."""
    panoptic_name = name + "_separated"

    def merged():
        detection = load_coco_json(instances_json, image_root, panoptic_name)
        sem = {
            os.path.basename(x["file_name"]).split(".")[0]: x["sem_seg_file_name"]
            for x in load_sem_seg(sem_seg_root, image_root)
        }
        for d in detection:
            key = os.path.basename(d["file_name"]).split(".")[0]
            if key in sem:
                d["sem_seg_file_name"] = sem[key]
        return detection

    DatasetCatalog.register(panoptic_name, merged)
    MetadataCatalog.get(panoptic_name).set(
        panoptic_root=panoptic_root,
        image_root=image_root,
        panoptic_json=panoptic_json,
        sem_seg_root=sem_seg_root,
        json_file=instances_json,
        evaluator_type="coco_panoptic_seg",
        **metadata,
    )

    # semantic-only variant (reference register_all_coco_panoptic:
    # "<name>_stuffonly" — just the stuff PNGs, for SemanticSegmentor)
    stuff_name = name + "_stuffonly"
    DatasetCatalog.register(
        stuff_name, lambda: load_sem_seg(sem_seg_root, image_root)
    )
    stuff_meta = dict(metadata)
    stuff_meta.setdefault("ignore_label", 255)
    stuff_meta.update(
        sem_seg_root=sem_seg_root,
        image_root=image_root,
        evaluator_type="sem_seg",
    )
    MetadataCatalog.get(stuff_name).set(**stuff_meta)


def load_coco_panoptic_json(
    json_file: str, image_dir: str, gt_dir: str, meta: dict
) -> list:
    """Standard-format panoptic dicts: ``pan_seg_file_name`` (id-encoded PNG)
    + ``segments_info`` with contiguous category ids (reference
    datasets/coco_panoptic.py:14-64)."""
    import json

    def _convert_category_id(segment_info):
        cid = segment_info["category_id"]
        if cid in meta["thing_dataset_id_to_contiguous_id"]:
            segment_info = dict(
                segment_info,
                category_id=meta["thing_dataset_id_to_contiguous_id"][cid],
                isthing=True,
            )
        else:
            segment_info = dict(
                segment_info,
                category_id=meta["stuff_dataset_id_to_contiguous_id"][cid],
                isthing=False,
            )
        return segment_info

    with open(json_file) as f:
        json_info = json.load(f)
    ret = []
    for ann in json_info["annotations"]:
        image_id = int(ann["image_id"])
        image_file = os.path.join(
            image_dir, os.path.splitext(ann["file_name"])[0] + ".jpg"
        )
        ret.append(
            {
                "file_name": image_file,
                "image_id": image_id,
                "pan_seg_file_name": os.path.join(gt_dir, ann["file_name"]),
                "segments_info": [
                    _convert_category_id(x) for x in ann["segments_info"]
                ],
            }
        )
    assert ret, f"No images found in {image_dir}!"
    return ret


def register_coco_panoptic(
    name: str,
    metadata: dict,
    image_root: str,
    panoptic_root: str,
    panoptic_json: str,
    instances_json: str | None = None,
) -> None:
    """Register a 'standard' panoptic dataset (id-encoded panoptic PNGs, one
    dict per image with segments_info) — the format Panoptic-DeepLab trains
    on (reference datasets/coco_panoptic.py:67)."""
    DatasetCatalog.register(
        name,
        lambda: load_coco_panoptic_json(
            panoptic_json, image_root, panoptic_root, metadata
        ),
    )
    MetadataCatalog.get(name).set(
        panoptic_root=panoptic_root,
        image_root=image_root,
        panoptic_json=panoptic_json,
        json_file=instances_json,
        evaluator_type="coco_panoptic_seg",
        ignore_label=255,
        label_divisor=1000,
        **metadata,
    )


def merge_to_panoptic(detection_dicts: list, sem_seg_dicts: list) -> list:
    """Merge detection and sem-seg dataset dicts on ``file_name`` (reference
    datasets/coco_panoptic.py:169)."""
    import copy

    sem_seg_file_to_entry = {x["file_name"]: x for x in sem_seg_dicts}
    assert len(sem_seg_file_to_entry) > 0
    results = []
    for det_dict in detection_dicts:
        dic = copy.copy(det_dict)
        dic.update(sem_seg_file_to_entry[dic["file_name"]])
        results.append(dic)
    return results


def register_all_coco_panoptic(root: str) -> None:
    for prefix, (panoptic_root, panoptic_json, semantic_root) in _PREDEFINED_SPLITS_COCO_PANOPTIC.items():
        prefix_instances = prefix[: -len("_panoptic")]
        if prefix + "_separated" in DatasetCatalog:
            continue
        instances_json = _PREDEFINED_SPLITS_COCO[prefix_instances][1]
        image_root = _PREDEFINED_SPLITS_COCO[prefix_instances][0]
        register_coco_panoptic_separated(
            prefix,
            _get_builtin_metadata("coco_panoptic_separated"),
            os.path.join(root, image_root),
            os.path.join(root, panoptic_root),
            os.path.join(root, panoptic_json),
            os.path.join(root, semantic_root),
            os.path.join(root, instances_json),
        )
        # the 'standard' variant, e.g. used by Panoptic-DeepLab
        # (reference builtin.py:137)
        register_coco_panoptic(
            prefix,
            _get_builtin_metadata("coco_panoptic_standard"),
            os.path.join(root, image_root),
            os.path.join(root, panoptic_root),
            os.path.join(root, panoptic_json),
            os.path.join(root, instances_json),
        )


def register_all_pascal_voc(root: str) -> None:
    from ...wsl.data import register_pascal_voc

    SPLITS = [
        ("voc_2007_trainval", "VOC2007", "trainval", 2007),
        ("voc_2007_train", "VOC2007", "train", 2007),
        ("voc_2007_val", "VOC2007", "val", 2007),
        ("voc_2007_test", "VOC2007", "test", 2007),
        ("voc_2012_trainval", "VOC2012", "trainval", 2012),
        ("voc_2012_train", "VOC2012", "train", 2012),
        ("voc_2012_val", "VOC2012", "val", 2012),
    ]
    for name, dirname, split, year in SPLITS:
        if name in DatasetCatalog:
            continue
        register_pascal_voc(name, os.path.join(root, dirname), split, year)


def register_all_lvis(root: str) -> None:
    from .lvis import register_lvis_instances

    SPLITS = {
        "lvis_v1_train": ("coco/", "lvis/lvis_v1_train.json"),
        "lvis_v1_val": ("coco/", "lvis/lvis_v1_val.json"),
        "lvis_v0.5_train": ("coco/", "lvis/lvis_v0.5_train.json"),
        "lvis_v0.5_val": ("coco/", "lvis/lvis_v0.5_val.json"),
    }
    for name, (image_root, json_file) in SPLITS.items():
        if name in DatasetCatalog:
            continue
        register_lvis_instances(
            name, {}, os.path.join(root, json_file), os.path.join(root, image_root)
        )


def register_all_ade20k(root: str) -> None:
    """ADE20k-150 sem-seg splits (reference builtin.py:237)."""
    from .builtin_meta import ADE20K_SEM_SEG_CATEGORIES

    base = os.path.join(root, "ADEChallengeData2016")
    for name, dirname in [("train", "training"), ("val", "validation")]:
        image_dir = os.path.join(base, "images", dirname)
        gt_dir = os.path.join(base, "annotations_detectron2", dirname)
        name = f"ade20k_sem_seg_{name}"
        DatasetCatalog.register(
            name,
            lambda x=image_dir, y=gt_dir: load_sem_seg(y, x, gt_ext="png", image_ext="jpg"),
        )
        MetadataCatalog.get(name).set(
            stuff_classes=ADE20K_SEM_SEG_CATEGORIES[:],
            image_root=image_dir,
            sem_seg_root=gt_dir,
            evaluator_type="sem_seg",
            ignore_label=255,
        )


_root = os.environ.get("JTSM_DATASETS", "datasets")
register_all_coco(_root)
register_all_coco_panoptic(_root)
register_all_lvis(_root)
register_all_ade20k(_root)
try:
    register_all_pascal_voc(_root)
except ImportError:
    pass
try:
    from .cityscapes import register_cityscapes

    register_cityscapes(_root)
except Exception:
    pass
try:
    from .cityscapes_panoptic import register_all_cityscapes_panoptic

    register_all_cityscapes_panoptic(_root)
except Exception:
    pass

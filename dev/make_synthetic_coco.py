"""Fabricate a tiny synthetic COCO-format dataset tree so the
quick_schedules configs (coco_2017_val_100 & friends) run offline —
random images, boxes, polygon masks, keypoints, and panoptic/stuff PNGs
in the exact layout `jtsm_tpu/data/datasets/builtin.py` expects.

Usage: python dev/make_synthetic_coco.py [--root datasets] [--num 8]
"""

import argparse
import json
import os

import numpy as np
from PIL import Image

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from jtsm_tpu.data.datasets.builtin_meta import COCO_CATEGORIES

_THING = [c for c in COCO_CATEGORIES if c["isthing"]]
COCO_80 = [c["id"] for c in _THING]  # the real 80 thing ids (1..90, gaps)
_STUFF = [c for c in COCO_CATEGORIES if not c["isthing"]]
STUFF_0 = _STUFF[0]["id"]  # dataset id of stuff contiguous id 1


def make_images(img_dir, n, rng):
    os.makedirs(img_dir, exist_ok=True)
    infos = []
    for i in range(n):
        h = int(rng.integers(240, 321))
        w = int(rng.integers(320, 401))
        name = f"{i:012d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8).astype(np.uint8)
        ).save(os.path.join(img_dir, name))
        infos.append({"id": i, "file_name": name, "height": h, "width": w})
    return infos


def rect_poly(x, y, bw, bh):
    return [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]]


def make_instances(infos, rng, with_kpts=False):
    anns = []
    aid = 1
    for info in infos:
        for _ in range(int(rng.integers(1, 5))):
            bw = float(rng.uniform(20, info["width"] / 2))
            bh = float(rng.uniform(20, info["height"] / 2))
            x = float(rng.uniform(0, info["width"] - bw - 1))
            y = float(rng.uniform(0, info["height"] - bh - 1))
            ann = {
                "id": aid,
                "image_id": info["id"],
                "category_id": 1 if with_kpts else int(rng.choice(COCO_80)),
                "bbox": [x, y, bw, bh],
                "area": bw * bh,
                "iscrowd": 0,
                "segmentation": rect_poly(x, y, bw, bh),
            }
            if with_kpts:
                kps = []
                for _ in range(17):
                    kps += [
                        float(rng.uniform(x, x + bw)),
                        float(rng.uniform(y, y + bh)),
                        2,
                    ]
                ann["keypoints"] = kps
                ann["num_keypoints"] = 17
            anns.append(ann)
            aid += 1
    return anns


def categories(with_kpts=False):
    if with_kpts:
        from jtsm_tpu.data.datasets.builtin_meta import COCO_PERSON_KEYPOINT_NAMES

        return [
            {
                "id": 1,
                "name": "person",
                "keypoints": list(COCO_PERSON_KEYPOINT_NAMES),
                "skeleton": [],
            }
        ]
    return [{"id": c["id"], "name": c["name"]} for c in _THING]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("JTSM_DATASETS", "datasets"))
    ap.add_argument("--num", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    coco = os.path.join(args.root, "coco")
    ann_dir = os.path.join(coco, "annotations")
    os.makedirs(ann_dir, exist_ok=True)

    infos = make_images(os.path.join(coco, "val2017"), args.num, rng)

    # instances_val2017_100.json
    inst = {
        "images": infos,
        "annotations": make_instances(infos, rng),
        "categories": categories(),
    }
    with open(os.path.join(ann_dir, "instances_val2017_100.json"), "w") as f:
        json.dump(inst, f)

    # person_keypoints_val2017_100.json
    kp = {
        "images": infos,
        "annotations": make_instances(infos, rng, with_kpts=True),
        "categories": categories(with_kpts=True),
    }
    with open(os.path.join(ann_dir, "person_keypoints_val2017_100.json"), "w") as f:
        json.dump(kp, f)

    # panoptic: id map PNGs + stuff sem-seg PNGs
    pan_dir = os.path.join(coco, "panoptic_val2017_100")
    stuff_dir = os.path.join(coco, "panoptic_stuff_val2017_100")
    os.makedirs(pan_dir, exist_ok=True)
    os.makedirs(stuff_dir, exist_ok=True)
    pan_anns = []
    for info in infos:
        h, w = info["height"], info["width"]
        seg_id = 1
        ids = np.zeros((h, w), np.uint32)
        segments = []
        # one stuff background + up to 2 things
        ids[:, :] = seg_id
        segments.append(
            {"id": seg_id, "category_id": STUFF_0, "iscrowd": 0, "area": int(h * w)}
        )
        seg_id += 1
        for _ in range(int(rng.integers(1, 3))):
            bw, bh = int(rng.integers(20, w // 2)), int(rng.integers(20, h // 2))
            x, y = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
            ids[y : y + bh, x : x + bw] = seg_id
            segments.append(
                {
                    "id": seg_id,
                    "category_id": int(rng.choice(COCO_80)),
                    "iscrowd": 0,
                    "area": int(bw * bh),
                }
            )
            seg_id += 1
        rgb = np.stack(
            [ids % 256, (ids // 256) % 256, ids // 256**2], -1
        ).astype(np.uint8)
        png = info["file_name"].replace(".jpg", ".png")
        Image.fromarray(rgb).save(os.path.join(pan_dir, png))
        # stuff sem-seg (separated-format convention): thing pixels = 0,
        # the stuff background = its contiguous id (1)
        sem = np.where(ids == 1, 1, 0).astype(np.uint8)
        Image.fromarray(sem).save(os.path.join(stuff_dir, png))
        pan_anns.append(
            {
                "image_id": info["id"],
                "file_name": png,
                "segments_info": segments,
            }
        )
    with open(os.path.join(ann_dir, "panoptic_val2017_100.json"), "w") as f:
        json.dump(
            {
                "images": infos,
                "annotations": pan_anns,
                "categories": [
                    {"id": c["id"], "name": c["name"], "isthing": c["isthing"]}
                    for c in COCO_CATEGORIES
                ],
            },
            f,
        )
    print(f"synthetic COCO written under {coco} ({args.num} images)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Extract PanopticFPN-style semantic-segmentation PNGs from COCO panoptic
annotations.

PanopticFPN's stuff branch trains on per-pixel *stuff* labels: every thing
class collapses to 0, stuff classes become contiguous ids 1..K, unlabeled
pixels become 255.  This script reads the panoptic id-encoded PNGs
(R+256*G+256^2*B segment ids) and writes one uint8 semantic PNG per image
into ``panoptic_stuff_{split}``, the layout
``jtsm_tpu/data/datasets/builtin.py`` registers for
``coco_2017_*_panoptic_separated``.

Counterpart of the reference's ``datasets/prepare_panoptic_fpn.py``
(separate_coco_semantic_from_panoptic); the val-100 step here symlinks from
the local full split instead of downloading (this environment is offline —
the 100-image fixtures come from ``dev/make_synthetic_coco.py``).

Usage:
    python datasets/prepare_panoptic_fpn.py [--root $JTSM_DATASETS/coco]
"""

import argparse
import functools
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jtsm_tpu.data.datasets.builtin_meta import COCO_CATEGORIES
from jtsm_tpu.evaluation.panoptic_evaluation import rgb2id


def build_id_map(categories):
    """dataset category id -> semantic label (0 things, 1..K stuff, 255 ignore)."""
    id_map = {0: 255}
    stuff = [c["id"] for c in categories if not c["isthing"]]
    assert len(stuff) <= 254, "semantic PNG is uint8; need <=254 stuff classes"
    for contiguous, cat_id in enumerate(stuff):
        id_map[cat_id] = contiguous + 1
    for c in categories:
        if c["isthing"]:
            id_map[c["id"]] = 0
    return id_map


def convert_one(task, id_map):
    src, dst, segments = task
    pan = rgb2id(np.asarray(Image.open(src), dtype=np.uint32))
    sem = np.full(pan.shape, 255, dtype=np.uint8)
    for seg in segments:
        sem[pan == seg["id"]] = id_map[seg["category_id"]]
    Image.fromarray(sem).save(dst)


def separate_semantic_from_panoptic(panoptic_json, panoptic_root, sem_seg_root, categories):
    os.makedirs(sem_seg_root, exist_ok=True)
    id_map = build_id_map(categories)
    with open(panoptic_json) as f:
        annos = json.load(f)["annotations"]
    tasks = [
        (
            os.path.join(panoptic_root, a["file_name"]),
            os.path.join(sem_seg_root, a["file_name"]),
            a["segments_info"],
        )
        for a in annos
    ]
    t0 = time.time()
    with mp.Pool(processes=max(mp.cpu_count() // 2, 4)) as pool:
        pool.map(functools.partial(convert_one, id_map=id_map), tasks, chunksize=64)
    print(f"wrote {len(tasks)} semantic PNGs to {sem_seg_root} in {time.time() - t0:.1f}s")


def link_val100(panoptic_100_json, dir_full, dir_100):
    """Symlink the 100-image quick-test subset out of the full split."""
    if not os.path.isfile(panoptic_100_json):
        print(f"skip {dir_100}: {panoptic_100_json} not found "
              "(generate fixtures with dev/make_synthetic_coco.py)")
        return
    if not os.path.isdir(dir_full):
        print(f"skip {dir_100}: full split {dir_full} not found")
        return
    with open(panoptic_100_json) as f:
        images = json.load(f)["images"]
    os.makedirs(dir_100, exist_ok=True)
    for img in images:
        base = os.path.splitext(img["file_name"])[0] + ".png"
        dst = os.path.join(dir_100, base)
        if os.path.lexists(dst):
            continue
        os.symlink(os.path.relpath(os.path.join(dir_full, base), start=dir_100), dst)
    print(f"linked {len(images)} PNGs into {dir_100}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    default_root = os.path.join(os.getenv("JTSM_DATASETS", "datasets"), "coco")
    ap.add_argument("--root", default=default_root, help="COCO dataset root")
    ap.add_argument("--splits", nargs="*", default=["val2017", "train2017"])
    args = ap.parse_args()

    for split in args.splits:
        pj = os.path.join(args.root, f"annotations/panoptic_{split}.json")
        if not os.path.isfile(pj):
            print(f"skip {split}: {pj} not found")
            continue
        separate_semantic_from_panoptic(
            pj,
            os.path.join(args.root, f"panoptic_{split}"),
            os.path.join(args.root, f"panoptic_stuff_{split}"),
            COCO_CATEGORIES,
        )

    link_val100(
        os.path.join(args.root, "annotations/panoptic_val2017_100.json"),
        os.path.join(args.root, "panoptic_val2017"),
        os.path.join(args.root, "panoptic_val2017_100"),
    )
    link_val100(
        os.path.join(args.root, "annotations/panoptic_val2017_100.json"),
        os.path.join(args.root, "panoptic_stuff_val2017"),
        os.path.join(args.root, "panoptic_stuff_val2017_100"),
    )


if __name__ == "__main__":
    main()

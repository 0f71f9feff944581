#!/usr/bin/env python
"""Convert VOC 2007 XML annotations to COCO jsons for PGT-style training.

Reference: projects/WSL/tools/convert_voc2007_pgt_json.py — the UWSOD/PGT
pipeline consumes VOC 2007 boxes as COCO-format jsons named
voc_2007_{split}_pgt.json (category ids 1..20, XYWH boxes), registered as
the builtin ``voc_2007_{train,val}_pgt`` datasets.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from jtsm_tpu.wsl.data import VOC_CLASS_NAMES, load_voc_instances


def to_coco(dicts) -> dict:
    images, annotations = [], []
    for d in dicts:
        images.append(
            {
                "id": d["image_id"],
                "file_name": os.path.basename(d["file_name"]),
                "height": d["height"],
                "width": d["width"],
            }
        )
        for a in d["annotations"]:
            x0, y0, x1, y1 = a["bbox"]  # XYXY from the VOC loader
            annotations.append(
                {
                    "id": len(annotations) + 1,
                    "image_id": d["image_id"],
                    "category_id": a["category_id"] + 1,  # 1-based COCO ids
                    "bbox": [x0, y0, x1 - x0, y1 - y0],
                    "area": (x1 - x0) * (y1 - y0),
                    "iscrowd": 0,
                    "difficult": int(a.get("difficult", False)),
                }
            )
    categories = [
        {"id": i + 1, "name": n, "isthing": 1} for i, n in enumerate(VOC_CLASS_NAMES)
    ]
    return {"images": images, "annotations": annotations, "categories": categories}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voc-root", default="datasets/VOC2007")
    ap.add_argument("--splits", nargs="+", default=["train", "val"])
    ap.add_argument("--output", default=None,
                    help="default: {voc-root}/annotations")
    args = ap.parse_args()

    out_dir = args.output or os.path.join(args.voc_root, "annotations")
    os.makedirs(out_dir, exist_ok=True)
    for split in args.splits:
        dicts = load_voc_instances(args.voc_root, split)
        coco = to_coco(dicts)
        out = os.path.join(out_dir, f"voc_2007_{split}_pgt.json")
        with open(out, "w") as f:
            json.dump(coco, f)
        print(
            f"[done] {split}: {len(coco['images'])} images, "
            f"{len(coco['annotations'])} boxes -> {out}"
        )


if __name__ == "__main__":
    main()

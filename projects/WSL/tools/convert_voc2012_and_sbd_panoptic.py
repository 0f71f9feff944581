#!/usr/bin/env python
"""Convert VOC 2012 + SBD masks to COCO-panoptic jsons + id-encoded PNGs.

Reference: projects/WSL/tools/convert_voc2012_and_sbd_panoptic.py. Things
keep their VOC class ids (1..20); all labeled background pixels form one
'background' stuff segment (id 21). Writes
VOC_SBD/annotations/{split}_panoptic.json and annotations/panoptic/*.png.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from jtsm_tpu.wsl import voc_sbd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voc-root", default="datasets/VOC2012")
    ap.add_argument("--sbd-root", default="datasets/SBD")
    ap.add_argument("--output", default="datasets/VOC_SBD")
    args = ap.parse_args()

    voc_sets = os.path.join(args.voc_root, "ImageSets", "Segmentation")
    ids_train_voc = voc_sbd.read_split_ids(os.path.join(voc_sets, "train.txt"))
    ids_val_voc = voc_sbd.read_split_ids(os.path.join(voc_sets, "val.txt"))

    ids_sbd = []
    if os.path.isdir(args.sbd_root):
        sbd_ids = set()
        for split in ("train", "val"):
            p = os.path.join(args.sbd_root, split + ".txt")
            if os.path.isfile(p):
                sbd_ids.update(voc_sbd.read_split_ids(p))
        ids_sbd = sorted(sbd_ids - set(ids_train_voc) - set(ids_val_voc))

    sbd = args.sbd_root if os.path.isdir(args.sbd_root) else None
    for ids, split in [
        (ids_sbd, "sbd_9118"),
        (ids_train_voc, "voc_2012_train"),
        (ids_val_voc, "voc_2012_val"),
    ]:
        if not ids:
            print(f"[skip] {split}: no ids")
            continue
        out = voc_sbd.convert_split_panoptic(
            ids, split, args.voc_root, sbd, args.output
        )
        print(f"[done] {split}: {len(ids)} images -> {out}")


if __name__ == "__main__":
    main()

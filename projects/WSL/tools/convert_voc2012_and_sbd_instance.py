#!/usr/bin/env python
"""Convert VOC 2012 + SBD segmentation masks to COCO instance jsons.

Reference: projects/WSL/tools/convert_voc2012_and_sbd_instance.py. Produces
VOC_SBD/annotations/{voc_2012_train,voc_2012_val,sbd_9118}_instance.json and
copies images into VOC_SBD/images, the layout the builtin
``voc_2012_*_instance`` / ``sbd_9118_instance`` datasets expect.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from jtsm_tpu.wsl import voc_sbd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--voc-root", default="datasets/VOC2012",
                    help="VOCdevkit/VOC2012 directory")
    ap.add_argument("--sbd-root", default="datasets/SBD",
                    help="SBD benchmark 'dataset' directory (inst/, cls/, img/)")
    ap.add_argument("--output", default="datasets/VOC_SBD")
    ap.add_argument("--mode", default="poly", choices=["poly", "mask"])
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
        # SBD images already in a VOC split are excluded (reference :306-325)
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
        out = voc_sbd.convert_split_instance(
            ids, split, args.voc_root, sbd, args.output, mode=args.mode
        )
        print(f"[done] {split}: {len(ids)} images -> {out}")


if __name__ == "__main__":
    main()

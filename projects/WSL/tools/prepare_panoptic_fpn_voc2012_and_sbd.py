#!/usr/bin/env python
"""Create the stuff-only semantic PNGs PanopticFPN-style training reads.

Reference: projects/WSL/tools/prepare_panoptic_fpn_voc2012_and_sbd.py —
things map to 0, stuff categories to contiguous ids from 1, unlabeled to 255.
Run after convert_voc2012_and_sbd_panoptic.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

from jtsm_tpu.wsl import voc_sbd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-dir", default="datasets/VOC_SBD")
    ap.add_argument(
        "--splits", nargs="+", default=["sbd_9118", "voc_2012_train", "voc_2012_val"]
    )
    args = ap.parse_args()

    ann = os.path.join(args.dataset_dir, "annotations")
    for split in args.splits:
        pj = os.path.join(ann, f"{split}_panoptic.json")
        if not os.path.isfile(pj):
            print(f"[skip] {split}: {pj} not found")
            continue
        voc_sbd.separate_semantic_from_panoptic(
            pj,
            os.path.join(ann, "panoptic"),
            os.path.join(ann, "panoptic_stuff"),
            voc_sbd.VOC_CATEGORIES,
        )
        print(f"[done] {split}")


if __name__ == "__main__":
    main()

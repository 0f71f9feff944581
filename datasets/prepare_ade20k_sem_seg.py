#!/usr/bin/env python3
"""Shift ADE20k-SceneParsing annotation PNGs to the 0-based / 255-ignore
convention the sem-seg loaders expect.

ADEChallengeData2016 ships labels where 0 means "unlabeled" and classes are
1..150.  `load_sem_seg` / SemSegEvaluator in this framework (like the
reference) use 0..149 with ignore=255, so every pixel is decremented with
uint8 wraparound sending 0 -> 255.  Writes into
``annotations_detectron2/{training,validation}`` (directory name kept for
config compatibility with the reference's
``datasets/prepare_ade20k_sem_seg.py``).

Usage: python datasets/prepare_ade20k_sem_seg.py [--root $JTSM_DATASETS/ADEChallengeData2016]
"""

import argparse
import os

import numpy as np
from PIL import Image


def convert_dir(src_dir, dst_dir):
    os.makedirs(dst_dir, exist_ok=True)
    names = sorted(os.listdir(src_dir))
    for name in names:
        img = np.asarray(Image.open(os.path.join(src_dir, name)))
        assert img.dtype == np.uint8, f"{name}: expected uint8 labels, got {img.dtype}"
        Image.fromarray(img - 1).save(os.path.join(dst_dir, name))
    print(f"{src_dir}: converted {len(names)} label maps -> {dst_dir}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    default_root = os.path.join(
        os.getenv("JTSM_DATASETS", "datasets"), "ADEChallengeData2016"
    )
    ap.add_argument("--root", default=default_root)
    args = ap.parse_args()

    for split in ("training", "validation"):
        src = os.path.join(args.root, "annotations", split)
        if not os.path.isdir(src):
            print(f"skip {split}: {src} not found")
            continue
        convert_dir(src, os.path.join(args.root, "annotations_detectron2", split))


if __name__ == "__main__":
    main()

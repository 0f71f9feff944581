#!/usr/bin/env python
"""MCG .mat -> pickle proposal converter (reference:
projects/WSL/tools/proposal_convert.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from jtsm_tpu.data import DatasetCatalog
from jtsm_tpu.wsl.data import (
    convert_mcg_mat_to_pickle,
    convert_mcg_seg_mat_to_pickle,
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", help="registered dataset name (for image ids)")
    parser.add_argument("mat_dir", help="directory of MCG .mat files")
    parser.add_argument("output", help="output pickle path")
    parser.add_argument(
        "--seg",
        action="store_true",
        help="segment-proposal mats (superpixels/labels/scores -> boxes + "
        "superpixel maps + one-hot membership; reference convert_mcg_seg)",
    )
    args = parser.parse_args()

    dicts = DatasetCatalog.get(args.dataset)
    image_ids = [d["image_id"] for d in dicts]
    convert = convert_mcg_seg_mat_to_pickle if args.seg else convert_mcg_mat_to_pickle
    convert(args.mat_dir, args.output, image_ids)
    print(f"wrote {args.output} ({len(image_ids)} images)")

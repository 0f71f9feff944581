#!/usr/bin/env python
"""Visualize dataset gt / dataloader output (reference: tools/visualize_data.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
from jtsm_tpu.data.detection_utils import read_image
from jtsm_tpu.utils.visualizer import Visualizer

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--source", choices=["annotation"], default="annotation")
    parser.add_argument("--output-dir", default="./")
    parser.add_argument("--show", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    name = cfg.DATASETS.TRAIN[0]
    metadata = MetadataCatalog.get(name)
    os.makedirs(args.output_dir, exist_ok=True)
    for d in DatasetCatalog.get(name):
        img = read_image(d["file_name"], "RGB")
        vis = Visualizer(img, metadata)
        out = vis.draw_dataset_dict(d)
        fpath = os.path.join(args.output_dir, os.path.basename(d["file_name"]))
        out.save(fpath)
        print(f"saved {fpath}")

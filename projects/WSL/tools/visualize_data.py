#!/usr/bin/env python
"""Visualize WSL dataset gt + precomputed MCG proposals
(reference: projects/WSL/tools/visualize_data.py — the core tool plus
``add_wsl_config`` and proposal-box overlays)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
from jtsm_tpu.data.detection_utils import read_image
from jtsm_tpu.structures import BoxMode
from jtsm_tpu.utils.visualizer import Visualizer
from jtsm_tpu.wsl import add_wsl_config


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config-file", default="")
    ap.add_argument("--output-dir", default="./wsl_vis")
    ap.add_argument("--max-images", type=int, default=20)
    ap.add_argument("--max-proposals", type=int, default=50)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    cfg = get_cfg()
    add_wsl_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    os.makedirs(args.output_dir, exist_ok=True)
    for dataset_name in cfg.DATASETS.TRAIN:
        dicts = DatasetCatalog.get(dataset_name)
        metadata = MetadataCatalog.get(dataset_name)
        for d in dicts[: args.max_images]:
            img = read_image(d["file_name"], "RGB")
            vis = Visualizer(img, metadata)
            out = vis.draw_dataset_dict(d)
            # overlay the strongest precomputed proposals, if loaded
            if "proposal_boxes" in d:
                boxes = np.asarray(d["proposal_boxes"])[: args.max_proposals]
                mode = d.get("proposal_bbox_mode", BoxMode.XYXY_ABS)
                boxes = BoxMode.convert(boxes, mode, BoxMode.XYXY_ABS)
                out = Visualizer(out.get_image(), metadata).overlay_instances(
                    boxes=boxes
                )
            name = os.path.basename(d["file_name"])
            out.save(os.path.join(args.output_dir, f"{dataset_name}_{name}"))
            print(f"wrote {dataset_name}_{name}")


if __name__ == "__main__":
    main()

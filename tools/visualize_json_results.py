#!/usr/bin/env python
"""Visualize COCO-format json predictions (reference:
tools/visualize_json_results.py)."""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from jtsm_tpu.data import DatasetCatalog, MetadataCatalog
from jtsm_tpu.data.detection_utils import read_image
from jtsm_tpu.structures import BoxMode
from jtsm_tpu.utils.visualizer import Visualizer

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="coco_instances_results.json")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--dataset", default="coco_2017_val")
    parser.add_argument("--conf-threshold", type=float, default=0.5)
    args = parser.parse_args()

    with open(args.input) as f:
        predictions = json.load(f)
    pred_by_image = defaultdict(list)
    for p in predictions:
        pred_by_image[p["image_id"]].append(p)

    metadata = MetadataCatalog.get(args.dataset)
    id_map = {
        v: k for k, v in metadata.get("thing_dataset_id_to_contiguous_id", {}).items()
    }
    reverse = metadata.get("thing_dataset_id_to_contiguous_id", {})

    os.makedirs(args.output, exist_ok=True)
    for dic in DatasetCatalog.get(args.dataset):
        preds = [
            p for p in pred_by_image[dic["image_id"]] if p["score"] >= args.conf_threshold
        ]
        if not preds:
            continue
        img = read_image(dic["file_name"], "RGB")
        boxes = np.asarray(
            [BoxMode.convert(p["bbox"], BoxMode.XYWH_ABS, BoxMode.XYXY_ABS) for p in preds]
        )
        scores = np.asarray([p["score"] for p in preds])
        classes = np.asarray([reverse.get(p["category_id"], p["category_id"]) for p in preds])
        vis = Visualizer(img, metadata)
        out = vis.draw_instance_predictions(
            {"boxes": boxes, "scores": scores, "classes": classes, "valid": np.ones(len(preds), bool)}
        )
        out.save(os.path.join(args.output, os.path.basename(dic["file_name"])))

#!/usr/bin/env python
"""Inference demo on images/video/webcam (reference: demo/demo.py)."""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from jtsm_tpu.config import get_cfg
from jtsm_tpu.data.detection_utils import read_image
from jtsm_tpu.utils.logger import setup_logger


def setup_cfg(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.freeze()
    return cfg


def get_parser():
    parser = argparse.ArgumentParser(description="jtsm_tpu demo")
    parser.add_argument("--config-file", metavar="FILE")
    parser.add_argument("--webcam", action="store_true")
    parser.add_argument("--video-input")
    parser.add_argument("--input", nargs="+")
    parser.add_argument("--output")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    return parser


if __name__ == "__main__":
    args = get_parser().parse_args()
    setup_logger(name="fvcore")
    logger = setup_logger()
    logger.info("Arguments: " + str(args))
    cfg = setup_cfg(args)

    from predictor import VisualizationDemo

    demo = VisualizationDemo(cfg)

    if args.input:
        if len(args.input) == 1:
            args.input = glob.glob(os.path.expanduser(args.input[0])) or args.input
        for path in args.input:
            img = read_image(path, format="BGR")
            start_time = time.time()
            predictions, visualized_output = demo.run_on_image(img)
            n = int(np.asarray(predictions.get("valid", [])).sum()) if "valid" in predictions else "?"
            logger.info(
                f"{path}: {n} instances in {time.time() - start_time:.2f}s"
            )
            if args.output:
                if os.path.isdir(args.output):
                    out_filename = os.path.join(args.output, os.path.basename(path))
                else:
                    out_filename = args.output
                visualized_output.save(out_filename)
    elif args.webcam or args.video_input:
        import cv2

        cam = cv2.VideoCapture(0 if args.webcam else args.video_input)
        for frame in demo.run_on_video(cam):
            if args.output:
                raise NotImplementedError("use --input for file output")
            cv2.imshow("jtsm_tpu demo", frame)
            if cv2.waitKey(1) == 27:
                break
        cam.release()

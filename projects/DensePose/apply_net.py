#!/usr/bin/env python
"""DensePose inference CLI (reference: projects/DensePose/apply_net.py).

Actions:
  dump  <cfg> <model> <input> [--output results.pkl]
      run inference, pickle per-image chart results
  show  <cfg> <model> <input> <visualizations> [--output outputres.png]
      run inference, paint dp_segm / dp_u / dp_v / bbox overlays

<input> is an image path, a glob, or a directory.
"""

import argparse
import glob
import logging
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

LOGGER_NAME = "apply_net"
logger = logging.getLogger(LOGGER_NAME)


def _collect_inputs(spec: str):
    if os.path.isdir(spec):
        return sorted(
            os.path.join(spec, f)
            for f in os.listdir(spec)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
    if "*" in spec or "?" in spec:
        return sorted(glob.glob(spec))
    return [spec]


def _setup(cfg_path: str, model_path: str, opts):
    import densepose  # noqa: F401 — registers DensePose components
    from densepose import add_densepose_config

    from jtsm_tpu.config import get_cfg

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(cfg_path)
    if opts:
        cfg.merge_from_list(opts)
    cfg.MODEL.WEIGHTS = model_path
    cfg.freeze()
    return cfg


def action_dump(args):
    from densepose.converters import ToChartResultConverter

    from jtsm_tpu.engine import DefaultPredictor

    cfg = _setup(args.cfg, args.model, args.opts)
    predictor = DefaultPredictor(cfg)
    results = []
    for fpath in _collect_inputs(args.input):
        import cv2

        img = cv2.imread(fpath)
        if img is None:
            logger.warning(f"cannot read {fpath}")
            continue
        outputs = predictor(img)
        entry = {"file_name": fpath}
        if "dp_patch" in outputs:
            batched = {k: np.asarray(v)[None] for k, v in outputs.items()}
            entry["pred_densepose"] = ToChartResultConverter.convert(batched, 0)
        entry["scores"] = np.asarray(outputs["scores"])
        entry["pred_boxes_XYXY"] = np.asarray(outputs["boxes"])
        results.append(entry)
        logger.info(f"processed {fpath}")
    out_fname = args.output or "results.pkl"
    with open(out_fname, "wb") as f:
        pickle.dump(results, f)
    logger.info(f"dumped {len(results)} entries to {out_fname}")


VISUALIZERS = ("dp_contour", "dp_segm", "dp_u", "dp_v", "bbox")


def action_show(args):
    import cv2

    from densepose.vis import DensePoseResultsVisualizer

    from jtsm_tpu.engine import DefaultPredictor

    cfg = _setup(args.cfg, args.model, args.opts)
    predictor = DefaultPredictor(cfg)
    vis_specs = args.visualizations.split(",")
    out_fname = args.output or "outputres.png"
    base, ext = os.path.splitext(out_fname)
    for i, fpath in enumerate(_collect_inputs(args.input)):
        img = cv2.imread(fpath)
        if img is None:
            continue
        outputs = predictor(img)
        batched = {k: np.asarray(v)[None] for k, v in outputs.items()}
        painted = img[:, :, ::-1]
        for spec in vis_specs:
            mode = {"dp_segm": "segm", "dp_contour": "segm", "dp_u": "u", "dp_v": "v"}.get(
                spec
            )
            if mode is not None and "dp_patch" in outputs:
                painted = DensePoseResultsVisualizer(mode=mode).visualize(
                    painted, batched, 0
                )
            elif spec == "bbox":
                from jtsm_tpu.utils.visualizer import Visualizer

                vis = Visualizer(np.asarray(painted))
                vis.draw_instance_predictions(
                    {k: np.asarray(v) for k, v in outputs.items()}
                )
                painted = vis.get_output().get_image()
        fname = f"{base}.{i:04d}{ext}" if len(vis_specs) else out_fname
        cv2.imwrite(fname, np.asarray(painted)[:, :, ::-1])
        logger.info(f"wrote {fname}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="action", required=True)
    for name, fn in (("dump", action_dump), ("show", action_show)):
        p = sub.add_parser(name)
        p.add_argument("cfg", metavar="<config>")
        p.add_argument("model", metavar="<model>")
        p.add_argument("input", metavar="<input>")
        if name == "show":
            p.add_argument("visualizations", metavar="<visualizations>",
                           help=f"comma-separated from {VISUALIZERS}")
        p.add_argument("--output", default=None)
        p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
        p.set_defaults(func=fn)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    args.func(args)


if __name__ == "__main__":
    main()

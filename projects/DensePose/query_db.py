#!/usr/bin/env python
"""DensePose dataset query CLI (reference: projects/DensePose/query_db.py).

Actions:
  print <dataset> <selector>   print entries (selector: field=value or
                               index ranges like 0:10)
  show  <dataset> <selector> <visualizations> [--output image.png]
        visualize gt annotations (bbox / dp_pts overlays)
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

logger = logging.getLogger("query_db")


def _load_entries(dataset: str):
    import densepose  # noqa: F401 (registers datasets)

    from jtsm_tpu.data import DatasetCatalog

    return DatasetCatalog.get(dataset)


def _select(entries, selector: str):
    if ":" in selector and "=" not in selector:
        lo, hi = selector.split(":")
        return entries[int(lo or 0) : int(hi or len(entries))]
    if "=" in selector:
        field, value = selector.split("=", 1)
        return [e for e in entries if str(e.get(field)) == value]
    return entries[: int(selector)] if selector.isdigit() else entries


def action_print(args):
    entries = _select(_load_entries(args.dataset), args.selector)
    for e in entries:
        print({k: v for k, v in e.items() if k != "annotations"})
        for ann in e.get("annotations", []):
            keys = sorted(ann.keys())
            print("  ann:", {k: np.shape(ann[k]) if hasattr(ann[k], "__len__") else ann[k]
                             for k in keys if not k.startswith("segmentation")})


def action_show(args):
    import cv2

    from jtsm_tpu.utils.visualizer import Visualizer

    entries = _select(_load_entries(args.dataset), args.selector)
    out = args.output or "entry.png"
    base, ext = os.path.splitext(out)
    for i, e in enumerate(entries):
        img = cv2.imread(e["file_name"])
        if img is None:
            logger.warning(f"cannot read {e['file_name']}")
            continue
        vis = Visualizer(img[:, :, ::-1])
        painted = vis.draw_dataset_dict(e)
        fname = f"{base}.{i:04d}{ext}"
        cv2.imwrite(fname, np.asarray(painted)[:, :, ::-1])
        logger.info(f"wrote {fname}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="action", required=True)
    p = sub.add_parser("print")
    p.add_argument("dataset")
    p.add_argument("selector", nargs="?", default="0:10")
    p.set_defaults(func=action_print)
    p = sub.add_parser("show")
    p.add_argument("dataset")
    p.add_argument("selector", nargs="?", default="0:10")
    p.add_argument("visualizations", nargs="?", default="bbox")
    p.add_argument("--output", default=None)
    p.set_defaults(func=action_show)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    args.func(args)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Convert a torchvision ResNet checkpoint to this framework's format
(reference: tools/convert-torchvision-to-d2.py)."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="torchvision .pth path")
    parser.add_argument("output", help="output .pkl (d2-named, consumed by the checkpoint converter)")
    args = parser.parse_args()

    import torch

    obj = torch.load(args.input, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()

    newmodel = {}
    for k in list(obj.keys()):
        old_k = k
        if "layer" not in k:
            k = "stem." + k
        for t in [1, 2, 3, 4]:
            k = k.replace(f"layer{t}", f"res{t + 1}")
        for t in [1, 2, 3]:
            k = k.replace(f"bn{t}", f"conv{t}.norm")
        k = k.replace("downsample.0", "shortcut")
        k = k.replace("downsample.1", "shortcut.norm")
        newmodel[k] = np.asarray(obj[old_k].numpy())
        print(f"{old_k} -> {k}")

    with open(args.output, "wb") as f:
        pickle.dump({"model": newmodel, "__author__": "torchvision", "matching_heuristics": True}, f)
    print(f"wrote {args.output}")

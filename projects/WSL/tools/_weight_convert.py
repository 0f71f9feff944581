"""Shared helpers for the WSL weight-converter CLIs (reference
projects/WSL/tools/convert_resnet_ws_c2.py / convert_vgg.py etc.: load a
Caffe2-pkl or torch-pth ImageNet checkpoint, rename keys into the d2-style
names this framework's checkpoint converter understands, write a .pkl that
``cfg.MODEL.WEIGHTS`` can consume directly)."""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import numpy as np


def load_source(path: str) -> dict:
    if path.endswith(".pkl"):
        from jtsm_tpu.checkpoint.c2_model_loading import load_reference_pkl

        state, _ = load_reference_pkl(path)
        return state
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
    return {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v) for k, v in obj.items()}


def save_d2_pkl(state: dict, path: str, author: str = "Caffe2") -> None:
    """Atomic write of a d2-zoo-format pkl (matching_heuristics on)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {"model": state, "__author__": author, "matching_heuristics": True}, f
        )
    os.replace(tmp, path)


def report(mapping) -> None:
    for old, new in mapping:
        marker = "" if old == new else "  ->  " + new
        print(f"{old}{marker}")

"""Convert reference-format weights (torch state dicts / Caffe2 pkl zoo) into
this framework's flax variable trees.

Reference: detectron2/checkpoint/c2_model_loading.py:12
(``convert_basic_c2_names``), :68 (``convert_c2_detectron_names``) and
detection_checkpoint.py:38 (pkl loading). The converter handles:

* Caffe2 zoo names (``res2_0_branch2a_w``) -> d2 names (``res2.0.conv1.weight``)
* d2 torch names -> this repo's flax paths (stable names, see layers.wrappers)
* layout changes: conv OIHW -> HWIO, linear (out,in) -> (in,out),
  deconv (in,out,kh,kw) -> (kh,kw,in,out) (+ spatial flip: torch's
  ConvTranspose2d is the mirrored convention of ``lax.conv_transpose``).
"""

from __future__ import annotations

import logging
import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Caffe2 -> d2 names (reference c2_model_loading.py:12-66)
# ---------------------------------------------------------------------------


def convert_basic_c2_names(original_keys):
    layer_keys = list(original_keys)
    layer_keys = [re.sub("_(bn)?_b$", ".norm.bias", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_s$", ".norm.weight", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_rm$", ".norm.running_mean", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_riv$", ".norm.running_var", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_gamma$", ".norm.weight", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_beta$", ".norm.bias", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_running_mean$", ".norm.running_mean", k) for k in layer_keys]
    layer_keys = [re.sub("_bn_running_var$", ".norm.running_var", k) for k in layer_keys]
    layer_keys = [re.sub("_b$", ".bias", k) for k in layer_keys]
    layer_keys = [re.sub("_w$", ".weight", k) for k in layer_keys]
    layer_keys = [re.sub("_s$", ".weight", k) for k in layer_keys]

    # stem
    layer_keys = [re.sub("^conv1\\.norm", "stem.conv1.norm", k) for k in layer_keys]
    layer_keys = [re.sub("^conv1\\.", "stem.conv1.", k) for k in layer_keys]
    layer_keys = [re.sub("^res\\.conv1\\.norm\\.", "conv1.norm.", k) for k in layer_keys]

    # residual blocks: resN_M_branch2{a,b,c} -> resN.M.conv{1,2,3}
    def convert_residual(k: str) -> str:
        m = re.match(r"^res(\d)_(\d+)_branch([12])([abc]?)(.*)$", k)
        if m is None:
            return k
        stage, block, branch, sub, rest = m.groups()
        if branch == "1":
            name = "shortcut"
        else:
            name = {"a": "conv1", "b": "conv2", "c": "conv3"}[sub]
        return f"res{stage}.{block}.{name}{rest}"

    layer_keys = [convert_residual(k) for k in layer_keys]
    return layer_keys


def convert_c2_detectron_names(weights: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Caffe2 Detectron/ImageNet zoo dict -> d2-style name dict
    (reference c2_model_loading.py:68). Only the backbone subset is needed
    for ImageNet-pretrained pkls; detection-head C2 names pass through the
    same basic rules."""
    original_keys = sorted(weights.keys())
    layer_keys = convert_basic_c2_names(original_keys)
    new_weights = {}
    for orig, renamed in zip(original_keys, layer_keys):
        if renamed.startswith("fc1000"):
            continue  # classification head of ImageNet pretraining
        new_weights[renamed] = weights[orig]
    return new_weights


# ---------------------------------------------------------------------------
# d2 torch names -> flax paths
# ---------------------------------------------------------------------------


def _d2_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """Returns (path tuple under the collection, kind) where kind in
    {conv, linear, deconv, norm, raw}."""
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]

    is_norm = len(body) >= 1 and body[-1] == "norm"
    if is_norm:
        module_path = body[:-1]
    else:
        module_path = body

    out = []
    i = 0
    while i < len(module_path):
        p = module_path[i]
        # resN.M -> resN_blockM
        if re.match(r"^res\d$", p) and i + 1 < len(module_path) and module_path[i + 1].isdigit():
            out.append(f"{p}_block{module_path[i + 1]}")
            i += 2
            continue
        if p == "rpn_head":
            out.append("head")
            i += 1
            continue
        # RetinaNet towers: torch nn.Sequential([conv, relu] * 4) indexes the
        # convs at 0/2/4/6; the flax head names them cls_subnet{0..3}
        if (
            p in ("cls_subnet", "bbox_subnet")
            and i + 1 < len(module_path)
            and module_path[i + 1].isdigit()
        ):
            out.append(f"{p}{int(module_path[i + 1]) // 2}")
            i += 2
            continue
        out.append(p)
        i += 1

    if is_norm:
        norm_leaf = {
            "weight": "weight",
            "bias": "bias",
            "running_mean": "running_mean",
            "running_var": "running_var",
        }[leaf]
        return tuple(out + ["norm", norm_leaf]), "norm"

    return tuple(out), {"weight": "w", "bias": "b"}.get(leaf, leaf)


def _is_linear(path: Tuple[str, ...], arr: np.ndarray) -> bool:
    return arr.ndim == 2


def _is_deconv(path: Tuple[str, ...]) -> bool:
    return any("deconv" in p for p in path)


def _set_in(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_in(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def convert_d2_state_dict_to_variables(
    state_dict: Dict[str, np.ndarray],
    template: Dict[str, Any],
) -> Tuple[Dict[str, Any], list, list]:
    """Map a d2-named numpy state dict onto a flax variables template
    ({'params': ..., 'frozen': ..., ...}). Unmatched template leaves keep
    their template values. Returns (variables, matched_keys, unmatched_keys).
    """
    import jax

    flat_template = _flatten(template)
    out = {p: v for p, v in flat_template.items()}
    matched, unmatched = [], []

    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        path, kind = _d2_to_flax_path(key)
        candidates = []
        if kind == "norm":
            # try frozen (FrozenBN) then params (GN/BN scale|bias)
            candidates = [
                ("frozen",) + path,
                ("params",) + path,
                ("batch_stats",) + path[:-1] + (
                    {"running_mean": "mean", "running_var": "var"}.get(path[-1], path[-1]),
                ),
            ]
            # GN/BN params use flax naming scale/bias
            if path[-1] == "weight":
                candidates.append(("params",) + path[:-1] + ("scale",))
        elif kind == "w":
            candidates = [
                ("params",) + path + ("conv", "kernel"),
                ("params",) + path + ("dense", "kernel"),
                ("params",) + path + ("kernel",),
            ]
        elif kind == "b":
            candidates = [
                ("params",) + path + ("conv", "bias"),
                ("params",) + path + ("dense", "bias"),
                ("params",) + path + ("bias",),
            ]
        else:
            candidates = [("params",) + path, ("frozen",) + path]

        target_path = None
        for c in candidates:
            if c in out:
                target_path = c
                break
        if target_path is None:
            unmatched.append(key)
            continue

        tmpl_leaf = out[target_path]
        converted = _convert_layout(arr, tmpl_leaf, target_path)
        if converted is None:
            unmatched.append(key)
            logger.warning(
                f"Shape mismatch for {key}: ckpt {arr.shape} vs model "
                f"{getattr(tmpl_leaf, 'shape', None)} at {'/'.join(target_path)}"
            )
            continue
        out[target_path] = converted
        matched.append(key)

    return _unflatten(out), matched, unmatched


def _convert_layout(arr: np.ndarray, tmpl_leaf, target_path):
    tmpl_shape = tuple(getattr(tmpl_leaf, "shape", ()))
    dtype = getattr(tmpl_leaf, "dtype", np.float32)
    if arr.ndim == 4:
        if "conv" in target_path[-2:] or target_path[-1] == "kernel":
            if any("deconv" in p for p in target_path):
                # torch deconv (in, out, kh, kw) -> flax (kh, kw, in, out),
                # mirrored spatially (transpose-conv convention difference)
                conv = np.transpose(arr, (2, 3, 0, 1))[::-1, ::-1]
            else:
                conv = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            if conv.shape == tmpl_shape:
                return conv.astype(dtype)
            return None
    if arr.ndim == 2:
        t = arr.T
        if t.shape == tmpl_shape:
            if _consumes_flattened_conv(target_path):
                # torch flattened pooled features channel-major (C, P, P);
                # this framework flattens NHWC (P, P, C) — permute rows.
                t = _reorder_chw_rows_to_hwc(t)
                if t is None:
                    return None
            return t.astype(dtype)
        if arr.shape == tmpl_shape:
            return arr.astype(dtype)
        return None
    if arr.shape == tmpl_shape:
        return arr.astype(dtype)
    return None


# first fully-connected layers that consume flattened pooled conv features;
# their torch weights are channel-major and must be row-permuted
_CONV_FLATTEN_FCS = ("fc1", "dan1")


def _consumes_flattened_conv(target_path: Tuple[str, ...]) -> bool:
    return any(p in _CONV_FLATTEN_FCS for p in target_path)


def _reorder_chw_rows_to_hwc(t: np.ndarray):
    """t: (C*P*P, out) with rows in (C, P, P) order -> (P, P, C) order.
    P is inferred (pooled resolutions are 7/14/28 in this codebase)."""
    in_dim = t.shape[0]
    for p in (7, 14, 28, 3, 2):
        if in_dim % (p * p) == 0:
            c = in_dim // (p * p)
            if c in (32, 64, 96, 128, 256, 512, 1024, 2048):
                return (
                    t.reshape(c, p, p, t.shape[1])
                    .transpose(1, 2, 0, 3)
                    .reshape(in_dim, t.shape[1])
                )
    logger.warning(f"Cannot infer pooled layout for fc of in_dim {in_dim}")
    return t


def _flatten(tree: Dict, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    out: Dict = {}
    for path, v in flat.items():
        _set_in(out, path, v)
    return out


def load_reference_pkl(path: str) -> Tuple[Dict[str, np.ndarray], bool]:
    """Load a zoo .pkl; returns (state_dict, is_caffe2_format)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "model" in data:
        meta = data.get("__author__", "")
        model = data["model"]
        if meta == "Caffe2" or "__author__" not in data:
            return {k: np.asarray(v) for k, v in model.items() if not k.endswith("_momentum")}, (
                data.get("__author__") != "detectron2"
            )
        return {k: np.asarray(v) for k, v in model.items()}, False
    return {k: np.asarray(v) for k, v in data.items() if not k.endswith("_momentum")}, True


def align_and_update_state_dict(template: Dict, path: str):
    """Full pipeline: pkl/pth -> variables (reference
    detection_checkpoint.py:38 + c2_model_loading.py:68)."""
    if path.endswith(".pkl"):
        state_dict, is_c2 = load_reference_pkl(path)
        if is_c2:
            state_dict = convert_c2_detectron_names(state_dict)
            # an ImageNet backbone pkl maps under backbone(.bottom_up)
            state_dict = _prefix_backbone(state_dict, template)
    else:
        import torch

        loaded = torch.load(path, map_location="cpu", weights_only=False)
        if "model" in loaded:
            loaded = loaded["model"]
        state_dict = {k: v.numpy() for k, v in loaded.items() if hasattr(v, "numpy")}
    variables, matched, unmatched = convert_d2_state_dict_to_variables(
        state_dict, template
    )
    logger.info(f"Loaded {len(matched)} tensors from {path}; {len(unmatched)} unmatched.")
    if unmatched:
        logger.info(f"Unmatched keys (first 20): {unmatched[:20]}")
    return variables


def _prefix_backbone(state_dict: Dict, template: Dict) -> Dict:
    """ImageNet pkls have bare names (stem.conv1...); detection models expect
    them under backbone.bottom_up (FPN) or backbone (C4)."""
    params = template.get("params", {})
    if "backbone" in params and "bottom_up" in params["backbone"]:
        prefix = "backbone.bottom_up."
    else:
        prefix = "backbone."
    return {prefix + k: v for k, v in state_dict.items()}

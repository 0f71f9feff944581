"""Model zoo API (reference: detectron2/model_zoo/model_zoo.py:86-146).

Config paths resolve against this repo's ``configs/``; checkpoint URLs point
at the reference zoo (``dl.fbaipublicfiles.com``) — weights are converted on
load by the checkpoint subsystem.
"""

from __future__ import annotations

import os
from typing import Optional

from ..config import CfgNode, get_cfg

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "configs")

_ModelZooUrls = {
    # config path (no prefix) -> reference checkpoint url suffix
    "COCO-Detection/faster_rcnn_R_50_C4_1x.yaml": "COCO-Detection/faster_rcnn_R_50_C4_1x/137257644/model_final_721ade.pkl",
    "COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml": "COCO-Detection/faster_rcnn_R_50_FPN_1x/137257794/model_final_b275ba.pkl",
    "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml": "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x/137260431/model_final_a54504.pkl",
    "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml": "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x/137849600/model_final_f10217.pkl",
    "COCO-InstanceSegmentation/mask_rcnn_R_101_FPN_3x.yaml": "COCO-InstanceSegmentation/mask_rcnn_R_101_FPN_3x/138205316/model_final_a3ec72.pkl",
}

_BASE_URL = "https://dl.fbaipublicfiles.com/detectron2"


def get_checkpoint_url(config_path: str) -> str:
    """Reference model_zoo.py:86."""
    if config_path in _ModelZooUrls:
        return f"{_BASE_URL}/{_ModelZooUrls[config_path]}"
    raise RuntimeError(f"{config_path} does not have a known checkpoint url!")


def get_config_file(config_path: str) -> str:
    """Reference model_zoo.py:104."""
    cfg_file = os.path.abspath(os.path.join(_CONFIG_DIR, config_path))
    if not os.path.exists(cfg_file):
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return cfg_file


def get_config(config_path: str, trained: bool = False) -> CfgNode:
    """Reference model_zoo.py:123."""
    cfg_file = get_config_file(config_path)
    cfg = get_cfg()
    cfg.merge_from_file(cfg_file)
    if trained:
        cfg.MODEL.WEIGHTS = get_checkpoint_url(config_path)
    return cfg


def get(config_path: str, trained: bool = False):
    """Reference model_zoo.py:146 — returns (model, variables). With
    trained=True the reference-zoo weights are fetched and converted (needs
    network access; offline environments should pass a local path via
    cfg.MODEL.WEIGHTS)."""
    import jax
    import jax.numpy as jnp

    from ..checkpoint import DetectionCheckpointer
    from ..modeling import build_model

    cfg = get_config(config_path, trained)
    model = build_model(cfg)
    bh = max(b[0] for b in cfg.TPU.IMAGE_BUCKETS)
    bw = max(b[1] for b in cfg.TPU.IMAGE_BUCKETS)
    dummy = {
        "image": jnp.zeros((1, bh, bw, 3), jnp.float32),
        "image_sizes": jnp.asarray([[bh, bw]], jnp.int32),
        "orig_sizes": jnp.asarray([[bh, bw]], jnp.int32),
    }
    rng = jax.random.key(0)
    variables = jax.jit(
        lambda r: model.init({"params": r, "sampling": r}, dummy, train=False)
    )(rng)
    if trained and cfg.MODEL.WEIGHTS and os.path.exists(cfg.MODEL.WEIGHTS):
        ckpt = DetectionCheckpointer(dict(variables))
        ckpt.load(cfg.MODEL.WEIGHTS)
        variables = ckpt.variables
    return model, variables

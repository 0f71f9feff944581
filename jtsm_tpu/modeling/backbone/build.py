"""Backbone registry + builder (reference: detectron2/modeling/backbone/build.py)."""

from __future__ import annotations

from ...config import CfgNode
from ...layers import ShapeSpec
from ...utils.registry import Registry

BACKBONE_REGISTRY = Registry("BACKBONE")


def build_backbone(cfg: CfgNode, input_shape: ShapeSpec | None = None):
    if input_shape is None:
        input_shape = ShapeSpec(channels=3)
    backbone_name = cfg.MODEL.BACKBONE.NAME
    backbone = BACKBONE_REGISTRY.get(backbone_name)(cfg, input_shape)
    return backbone

"""WS-ResNet backbones for WSOD (reference:
projects/WSL/wsl/modeling/backbone/resnet_wsl.py:631
``build_wsl_resnet_backbone`` and resnet_wsl_v2.py:749 — the DRN-WSOD
pretrained 'WSR' variants whose stem max-pools differently, plus the
MRRP multi-branch variant resnet_wsl_mrrp.py:1033."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec
from ...modeling.backbone.build import BACKBONE_REGISTRY
from ...modeling.backbone.resnet import BasicStem, ResNet

Array = jax.Array


class WSLStem(nn.Module):
    """7x7 conv stride 2 + 2x2 max pool stride 2 (the DRN-WSOD stem; the
    standard stem uses a 3x3 pool with padding)."""

    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv2d(
            features=self.out_channels,
            kernel_size=7,
            stride=2,
            padding=3,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="conv1",
        )(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    @property
    def stride(self) -> int:
        return 4


class WSLResNet(ResNet):
    def make_stem(self):
        return WSLStem(
            out_channels=self.stem_out_channels, norm=self.norm, dtype=self.dtype
        )


@BACKBONE_REGISTRY.register()
def build_wsl_resnet_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> WSLResNet:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return WSLResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        norm=cfg.MODEL.RESNETS.NORM,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        dtype=dtype,
    )


# the reference registers a v2 builder with identical config surface
@BACKBONE_REGISTRY.register()
def build_wsl_resnet_v2_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> WSLResNet:
    return build_wsl_resnet_backbone(cfg, input_shape)

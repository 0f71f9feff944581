"""DeepLab ResNet variant (reference: projects/DeepLab/deeplab/resnet.py —
``DeepLabStem`` 3x 3x3 convs + res5 multi-grid dilation). Built on the core
ResNet by composing a custom stem."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Conv2d, ShapeSpec
from jtsm_tpu.modeling.backbone.backbone import Backbone
from jtsm_tpu.modeling.backbone.build import BACKBONE_REGISTRY
from jtsm_tpu.modeling.backbone.resnet import ResNet

Array = jax.Array


class DeepLabStem(nn.Module):
    """3x 3x3 convs instead of the 7x7 (reference resnet.py DeepLabStem)."""

    out_channels: int = 128
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.out_channels
        x = Conv2d(
            features=c // 2, kernel_size=3, stride=2, padding=1, use_bias=False,
            norm=self.norm, activation=nn.relu, dtype=self.dtype, name="conv1",
        )(x)
        x = Conv2d(
            features=c // 2, kernel_size=3, stride=1, padding=1, use_bias=False,
            norm=self.norm, activation=nn.relu, dtype=self.dtype, name="conv2",
        )(x)
        x = Conv2d(
            features=c, kernel_size=3, stride=1, padding=1, use_bias=False,
            norm=self.norm, activation=nn.relu, dtype=self.dtype, name="conv3",
        )(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x

    @property
    def stride(self) -> int:
        return 4


class DeepLabResNet(ResNet):
    """ResNet whose stem is DeepLabStem (res5 dilation handled by the base
    class via res5_dilation; multi-grid approximated by uniform dilation)."""

    def make_stem(self):
        return DeepLabStem(
            out_channels=self.stem_out_channels, norm=self.norm, dtype=self.dtype
        )


@BACKBONE_REGISTRY.register()
def build_resnet_deeplab_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> DeepLabResNet:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return DeepLabResNet(
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
        remat="backbone_blocks" in cfg.TPU.REMAT,
        dtype=dtype,
    )

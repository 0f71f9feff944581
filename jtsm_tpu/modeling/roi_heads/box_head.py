"""Box feature head (reference: detectron2/modeling/roi_heads/box_head.py
``FastRCNNConvFCHead``)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, Linear, ShapeSpec, get_norm
from ...utils.registry import Registry

ROI_BOX_HEAD_REGISTRY = Registry("ROI_BOX_HEAD")

Array = jax.Array


@ROI_BOX_HEAD_REGISTRY.register()
class FastRCNNConvFCHead(nn.Module):
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    norm: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_conv):
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
        if self.num_fc > 0:
            x = x.reshape(x.shape[0], -1)
            for i in range(self.num_fc):
                x = Linear(
                    features=self.fc_dim,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        1.0, "fan_in", "uniform"
                    ),
                    name=f"fc{i + 1}",
                )(x)
                x = nn.relu(x)
        return x

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: ShapeSpec):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            num_conv=cfg.MODEL.ROI_BOX_HEAD.NUM_CONV,
            conv_dim=cfg.MODEL.ROI_BOX_HEAD.CONV_DIM,
            num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
            fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
            dtype=dtype,
        )


def build_box_head(cfg: CfgNode, input_shape: ShapeSpec):
    name = cfg.MODEL.ROI_BOX_HEAD.NAME or "FastRCNNConvFCHead"
    cls_ = ROI_BOX_HEAD_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, input_shape))

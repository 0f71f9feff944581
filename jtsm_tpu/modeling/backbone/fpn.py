"""Feature Pyramid Network (reference: detectron2/modeling/backbone/fpn.py:16;
top blocks :173 ``LastLevelMaxPool``, :188 ``LastLevelP6P7``)."""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec, get_norm, interpolate_nearest
from .backbone import Backbone
from .build import BACKBONE_REGISTRY
from .resnet import build_resnet_backbone

Array = jax.Array


class LastLevelMaxPool(nn.Module):
    """p6 = maxpool(p5) (reference fpn.py:173)."""

    num_levels: int = 1
    in_feature: str = "p5"

    @nn.compact
    def __call__(self, x: Array):
        return [nn.max_pool(x, (1, 1), strides=(2, 2))]


class LastLevelP6P7(nn.Module):
    """p6/p7 from res5 or p5 via stride-2 convs (reference fpn.py:188)."""

    out_channels: int
    in_feature: str = "res5"
    dtype: Any = jnp.float32
    num_levels: int = 2

    @nn.compact
    def __call__(self, x: Array):
        p6 = Conv2d(
            features=self.out_channels,
            kernel_size=3,
            stride=2,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            name="p6",
        )(x)
        p7 = Conv2d(
            features=self.out_channels,
            kernel_size=3,
            stride=2,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            name="p7",
        )(nn.relu(p6))
        return [p6, p7]


class FPN(Backbone):
    bottom_up: Backbone
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    norm: str = ""
    top_block: Optional[nn.Module] = None
    fuse_type: str = "sum"
    dtype: Any = jnp.float32

    def _strides_and_names(self):
        bu_shapes = self.bottom_up.output_shape()
        in_strides = [bu_shapes[f].stride for f in self.in_features]
        out_names = [f"p{int(math.log2(s))}" for s in in_strides]
        return in_strides, out_names

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        bottom_up_features = self.bottom_up(x)
        in_strides, out_names = self._strides_and_names()

        laterals = []
        for idx, f in enumerate(self.in_features):
            lat = Conv2d(
                features=self.out_channels,
                kernel_size=1,
                use_bias=not self.norm,
                norm=self.norm,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                name=f"fpn_lateral{int(math.log2(in_strides[idx]))}",
            )(bottom_up_features[f])
            laterals.append(lat)

        # top-down pathway
        results = [None] * len(laterals)
        prev = laterals[-1]
        results[-1] = prev
        for idx in range(len(laterals) - 2, -1, -1):
            td = interpolate_nearest(prev, 2)
            # crop in case of odd sizes (shouldn't happen with divisible pads)
            lh, lw = laterals[idx].shape[1], laterals[idx].shape[2]
            td = td[:, :lh, :lw, :]
            prev = laterals[idx] + td
            if self.fuse_type == "avg":
                prev = prev / 2.0
            results[idx] = prev

        outputs = {}
        for idx, name in enumerate(out_names):
            outputs[name] = Conv2d(
                features=self.out_channels,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=self.norm,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                name=f"fpn_output{int(math.log2(in_strides[idx]))}",
            )(results[idx])

        if self.top_block is not None:
            top_in = (
                bottom_up_features[self.top_block.in_feature]
                if self.top_block.in_feature in bottom_up_features
                else outputs[self.top_block.in_feature]
            )
            extra = self.top_block(top_in)
            last_stride = in_strides[-1]
            for i, e in enumerate(extra):
                outputs[f"p{int(math.log2(last_stride)) + 1 + i}"] = e
        return outputs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        in_strides, out_names = self._strides_and_names()
        shapes = {
            name: ShapeSpec(channels=self.out_channels, stride=s)
            for name, s in zip(out_names, in_strides)
        }
        if self.top_block is not None:
            last = in_strides[-1]
            for i in range(self.top_block.num_levels):
                stride = last * (2 ** (i + 1))
                shapes[f"p{int(math.log2(stride))}"] = ShapeSpec(
                    channels=self.out_channels, stride=stride
                )
        return shapes

    @property
    def size_divisibility(self) -> int:
        # reference fpn.py: divisibility is the last in_feature's stride
        in_strides, _ = self._strides_and_names()
        return max(in_strides)


@BACKBONE_REGISTRY.register()
def build_resnet_fpn_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> FPN:
    """Reference fpn.py:202."""
    bottom_up = build_resnet_backbone(cfg, input_shape)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        top_block=LastLevelMaxPool(),
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_retinanet_resnet_fpn_backbone(cfg: CfgNode, input_shape: ShapeSpec) -> FPN:
    """Reference fpn.py:223 — P6/P7 come from res5."""
    bottom_up = build_resnet_backbone(cfg, input_shape)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    in_channels_p6p7 = bottom_up.output_shape()["res5"].channels
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        top_block=LastLevelP6P7(
            out_channels=cfg.MODEL.FPN.OUT_CHANNELS, in_feature="res5", dtype=dtype
        ),
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )

"""Semantic segmentation meta-arch + FPN sem-seg head.

Reference: detectron2/modeling/meta_arch/semantic_seg.py:28
(``SemanticSegmentor``), :104 (``SemSegFPNHead`` — scale heads upsampled to
the common stride and summed, 1x1 predictor, CE loss at 1/common_stride
resolution then x4 upsample).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec, get_norm, interpolate_bilinear
from ...ops.losses import softmax_cross_entropy
from ...utils.registry import Registry
from ..backbone.build import build_backbone
from .build import META_ARCH_REGISTRY

SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")

Array = jax.Array


@SEM_SEG_HEADS_REGISTRY.register()
class SemSegFPNHead(nn.Module):
    in_features: Sequence[str]
    feature_strides: Sequence[int]
    feature_channels: Sequence[int]
    num_classes: int
    conv_dims: int = 128
    common_stride: int = 4
    norm: str = "GN"
    loss_weight: float = 1.0
    ignore_value: int = 255
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            in_features=in_features,
            feature_strides=tuple(input_shape[f].stride for f in in_features),
            feature_channels=tuple(input_shape[f].channels for f in in_features),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            conv_dims=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        targets: Optional[Array] = None,
        train: bool = False,
        weights: Optional[Array] = None,  # (B, H, W) per-pixel loss weights
        targets_stride: int = 1,  # stride targets were ALREADY sampled at
    ):
        """Returns (logits at common_stride, losses dict)."""
        import math

        out = None
        for i, f in enumerate(self.in_features):
            stride = self.feature_strides[i]
            head_length = max(1, int(math.log2(stride) - math.log2(self.common_stride)))
            x = features[f]
            for k in range(head_length):
                x = Conv2d(
                    features=self.conv_dims,
                    kernel_size=3,
                    padding=1,
                    use_bias=not self.norm,
                    norm=self.norm,
                    activation=nn.relu,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        1.0, "fan_out", "normal"
                    ),
                    name=f"{f}_head_conv{k}",
                )(x)
                if stride != self.common_stride:
                    x = interpolate_bilinear(
                        x, (x.shape[1] * 2, x.shape[2] * 2)
                    )
                    stride = stride // 2
            if out is None:
                out = x
            else:
                # coarser levels are ceil-divided, so their 2x-upsample chain
                # can overshoot the finest level's grid when the padded image
                # size is not divisible by the coarsest stride — crop to the
                # common size (reference relies on ImageList divisibility
                # padding making the sizes agree exactly)
                hh = min(out.shape[1], x.shape[1])
                ww = min(out.shape[2], x.shape[2])
                out = out[:, :hh, :ww] + x[:, :hh, :ww]

        logits = Conv2d(
            features=self.num_classes,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(out).astype(jnp.float32)

        losses = {}
        if train and targets is not None:
            # targets at full input resolution (or pre-strided by the
            # caller, e.g. JTSM's pgt painting): downsample the remainder
            assert self.common_stride % targets_stride == 0, (
                self.common_stride,
                targets_stride,
            )
            rs = self.common_stride // targets_stride
            t = targets[:, ::rs, ::rs]
            th, tw = logits.shape[1], logits.shape[2]
            t = t[:, :th, :tw]
            valid = (t != self.ignore_value) & (t >= 0)
            ce = softmax_cross_entropy(logits, jnp.clip(t, 0, self.num_classes - 1))
            if weights is not None:
                # weights follow the targets' resolution (pre-strided by the
                # same targets_stride), so stride by the same remainder
                w = weights[:, ::rs, ::rs][:, :th, :tw]
                ce = ce * w
            loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            losses["loss_sem_seg"] = loss * self.loss_weight
        return logits, losses


def build_sem_seg_head(cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
    name = cfg.MODEL.SEM_SEG_HEAD.NAME
    cls_ = SEM_SEG_HEADS_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, input_shape))


@META_ARCH_REGISTRY.register()
class SemanticSegmentor(nn.Module):
    """Reference semantic_seg.py:28."""

    backbone: nn.Module
    sem_seg_head: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    common_stride: int = 4

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        return dict(
            backbone=backbone,
            sem_seg_head=build_sem_seg_head(cfg, backbone.output_shape()),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        features = self.backbone(images)
        logits, losses = self.sem_seg_head(
            features, batch.get("gt_sem_seg"), train=train
        )
        if train:
            return losses
        # upsample logits to input resolution; argmax per pixel
        h, w = batch["image"].shape[1], batch["image"].shape[2]
        up = interpolate_bilinear(logits, (h, w))
        return {"sem_seg": jnp.argmax(up, axis=-1).astype(jnp.int32), "sem_seg_logits": up}

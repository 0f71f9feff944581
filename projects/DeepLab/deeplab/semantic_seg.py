"""DeepLabV3 / V3+ heads (reference:
projects/DeepLab/deeplab/semantic_seg.py:16 ``DeepLabV3PlusHead``, :265
``DeepLabV3Head``)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ASPP, Conv2d, ShapeSpec, interpolate_bilinear
from jtsm_tpu.modeling.meta_arch.semantic_seg import SEM_SEG_HEADS_REGISTRY

from .loss import DeepLabCE

Array = jax.Array


@SEM_SEG_HEADS_REGISTRY.register()
class DeepLabV3Head(nn.Module):
    in_features: Sequence[str]
    num_classes: int
    aspp_channels: int = 256
    aspp_dilations: Sequence[int] = (6, 12, 18)
    aspp_dropout: float = 0.1
    common_stride: int = 16
    norm: str = "GN"
    loss_weight: float = 1.0
    loss_type: str = "cross_entropy"
    ignore_value: int = 255
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            in_features=tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            aspp_channels=cfg.MODEL.SEM_SEG_HEAD.ASPP_CHANNELS,
            aspp_dilations=tuple(cfg.MODEL.SEM_SEG_HEAD.ASPP_DILATIONS),
            aspp_dropout=cfg.MODEL.SEM_SEG_HEAD.ASPP_DROPOUT,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            loss_type=cfg.MODEL.SEM_SEG_HEAD.LOSS_TYPE,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, features, targets=None, train: bool = False, weights=None):
        x = features[self.in_features[-1]]
        x = ASPP(
            in_channels=x.shape[-1],
            out_channels=self.aspp_channels,
            dilations=tuple(self.aspp_dilations),
            norm=self.norm,
            dropout=self.aspp_dropout,
            dtype=self.dtype,
            name="aspp",
        )(x, deterministic=not train)
        logits = Conv2d(
            features=self.num_classes,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x).astype(jnp.float32)

        losses = {}
        if train and targets is not None:
            stride = self.common_stride
            t = targets[:, ::stride, ::stride][:, : logits.shape[1], : logits.shape[2]]
            w = (
                weights[:, ::stride, ::stride][:, : logits.shape[1], : logits.shape[2]]
                if weights is not None
                else None
            )
            if self.loss_type == "hard_pixel_mining":
                loss = DeepLabCE(logits, t, self.ignore_value, weights=w)
            else:
                from jtsm_tpu.ops.losses import softmax_cross_entropy

                valid = (t != self.ignore_value) & (t >= 0)
                ce = softmax_cross_entropy(logits, jnp.clip(t, 0, self.num_classes - 1))
                if w is not None:
                    ce = ce * w
                loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            losses["loss_sem_seg"] = loss * self.loss_weight
        return logits, losses


@SEM_SEG_HEADS_REGISTRY.register()
class DeepLabV3PlusHead(nn.Module):
    """V3+ decoder: ASPP on the deep feature + low-level projection fusion."""

    in_features: Sequence[str]  # e.g. (res2, res5)
    project_features: Sequence[str] = ("res2",)
    project_channels: Sequence[int] = (48,)
    num_classes: int = 19
    aspp_channels: int = 256
    aspp_dilations: Sequence[int] = (6, 12, 18)
    aspp_dropout: float = 0.1
    decoder_channels: int = 256
    common_stride: int = 4
    norm: str = "GN"
    loss_weight: float = 1.0
    loss_type: str = "hard_pixel_mining"
    loss_top_k: float = 0.2
    ignore_value: int = 255
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        base = DeepLabV3Head.from_config(cfg, input_shape)
        base.pop("common_stride")
        return dict(
            project_features=tuple(cfg.MODEL.SEM_SEG_HEAD.PROJECT_FEATURES),
            project_channels=tuple(cfg.MODEL.SEM_SEG_HEAD.PROJECT_CHANNELS),
            decoder_channels=cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            **base,
        )

    def _head_transform(self, x):
        """Extra transform between decoder and predictor — identity here;
        Panoptic-DeepLab's sem-seg head overrides it (reference
        panoptic_deeplab/panoptic_seg.py:213 adds a HEAD_CHANNELS conv)."""
        return x

    @nn.compact
    def __call__(self, features, targets=None, train: bool = False, weights=None):
        deep = features[self.in_features[-1]]
        x = ASPP(
            in_channels=deep.shape[-1],
            out_channels=self.aspp_channels,
            dilations=tuple(self.aspp_dilations),
            norm=self.norm,
            dropout=self.aspp_dropout,
            dtype=self.dtype,
            name="aspp",
        )(deep, deterministic=not train)

        for f, ch in zip(self.project_features, self.project_channels):
            low = Conv2d(
                features=ch,
                kernel_size=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                name=f"project_{f}",
            )(features[f])
            x = interpolate_bilinear(x, (low.shape[1], low.shape[2]))
            x = jnp.concatenate([x, low], axis=-1)
            x = Conv2d(
                features=self.decoder_channels,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                name=f"fuse_{f}",
            )(x)

        x = self._head_transform(x)
        logits = Conv2d(
            features=self.num_classes,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x).astype(jnp.float32)

        losses = {}
        if train and targets is not None:
            stride = self.common_stride
            t = targets[:, ::stride, ::stride][:, : logits.shape[1], : logits.shape[2]]
            w = (
                weights[:, ::stride, ::stride][:, : logits.shape[1], : logits.shape[2]]
                if weights is not None
                else None
            )
            if self.loss_type == "hard_pixel_mining":
                loss = DeepLabCE(logits, t, self.ignore_value, self.loss_top_k, weights=w)
            else:
                from jtsm_tpu.ops.losses import softmax_cross_entropy

                valid = (t != self.ignore_value) & (t >= 0)
                ce = softmax_cross_entropy(logits, jnp.clip(t, 0, self.num_classes - 1))
                if w is not None:
                    ce = ce * w
                loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            losses["loss_sem_seg"] = loss * self.loss_weight
        return logits, losses

"""Panoptic-DeepLab meta-arch (reference:
projects/Panoptic-DeepLab/panoptic_deeplab/panoptic_seg.py:37 — sem-seg head
+ instance center heatmap & offset head; :355 head definition)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ASPP, Conv2d, ShapeSpec, interpolate_bilinear
from jtsm_tpu.modeling.backbone.build import build_backbone
from jtsm_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from jtsm_tpu.modeling.meta_arch.semantic_seg import (
    SEM_SEG_HEADS_REGISTRY,
    build_sem_seg_head,
)
from jtsm_tpu.utils.registry import Registry

Array = jax.Array

INS_EMBED_BRANCHES_REGISTRY = Registry("INS_EMBED_BRANCHES")


@INS_EMBED_BRANCHES_REGISTRY.register()
class PanopticDeepLabInsEmbedHead(nn.Module):
    """Decoder producing a 1-channel center heatmap + 2-channel offsets
    (reference panoptic_seg.py:355 ``PanopticDeepLabInsEmbedHead``)."""

    in_features: Sequence[str]
    project_features: Sequence[str]
    project_channels: Sequence[int]
    aspp_channels: int = 256
    aspp_dilations: Sequence[int] = (6, 12, 18)
    decoder_channels: int = 128
    head_channels: int = 32
    norm: str = "GN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, Array], train: bool = False):
        deep = features[self.in_features[-1]]
        x = ASPP(
            in_channels=deep.shape[-1],
            out_channels=self.aspp_channels,
            dilations=tuple(self.aspp_dilations),
            norm=self.norm,
            dtype=self.dtype,
            name="aspp",
        )(x=deep, deterministic=not train)
        for f, ch in zip(reversed(self.project_features), reversed(self.project_channels)):
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
        h = Conv2d(
            features=self.head_channels,
            kernel_size=3,
            padding=1,
            use_bias=not self.norm,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="center_head",
        )(x)
        center = Conv2d(
            features=1, kernel_size=1, dtype=self.dtype, name="center_predictor"
        )(h).astype(jnp.float32)
        o = Conv2d(
            features=self.head_channels,
            kernel_size=3,
            padding=1,
            use_bias=not self.norm,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="offset_head",
        )(x)
        offset = Conv2d(
            features=2, kernel_size=1, dtype=self.dtype, name="offset_predictor"
        )(o).astype(jnp.float32)
        return center[..., 0], offset


# backwards-compat alias (earlier name in this repo)
InsEmbedHead = PanopticDeepLabInsEmbedHead


def _import_deeplab_v3plus():
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "DeepLab")
    )
    from deeplab.semantic_seg import DeepLabV3PlusHead

    return DeepLabV3PlusHead


_DeepLabV3PlusHead = _import_deeplab_v3plus()


@SEM_SEG_HEADS_REGISTRY.register()
class PanopticDeepLabSemSegHead(_DeepLabV3PlusHead):
    """DeepLabV3+ decoder with an extra HEAD_CHANNELS conv before the
    predictor and top-k hard-pixel-mining CE (reference
    panoptic_deeplab/panoptic_seg.py:213)."""

    head_channels: int = 256

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape):
        ret = _DeepLabV3PlusHead.from_config(cfg, input_shape)
        ret["head_channels"] = cfg.MODEL.SEM_SEG_HEAD.HEAD_CHANNELS
        ret["loss_top_k"] = cfg.MODEL.SEM_SEG_HEAD.LOSS_TOP_K
        return ret

    def _head_transform(self, x):
        return Conv2d(
            features=self.head_channels,
            kernel_size=3,
            padding=1,
            use_bias=not self.norm,
            norm=self.norm,
            activation=nn.relu,
            dtype=self.dtype,
            name="head_conv",
        )(x)


@META_ARCH_REGISTRY.register()
class PanopticDeepLab(nn.Module):
    backbone: nn.Module
    sem_seg_head: nn.Module
    ins_embed_head: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    common_stride: int = 4
    center_loss_weight: float = 200.0
    offset_loss_weight: float = 0.01
    stuff_area: int = 2048
    center_threshold: float = 0.1
    nms_kernel: int = 7
    top_k_instances: int = 200
    num_thing_classes: int = 80

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        shapes = backbone.output_shape()
        ih = cfg.MODEL.INS_EMBED_HEAD
        return dict(
            backbone=backbone,
            sem_seg_head=build_sem_seg_head(cfg, shapes),
            ins_embed_head=INS_EMBED_BRANCHES_REGISTRY.get(ih.NAME)(
                in_features=tuple(ih.IN_FEATURES),
                project_features=tuple(ih.PROJECT_FEATURES),
                project_channels=tuple(ih.PROJECT_CHANNELS),
                aspp_channels=ih.ASPP_CHANNELS,
                aspp_dilations=tuple(ih.ASPP_DILATIONS),
                decoder_channels=ih.CONVS_DIM,
                head_channels=ih.HEAD_CHANNELS,
                norm=ih.NORM,
            ),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            common_stride=cfg.MODEL.SEM_SEG_HEAD.COMMON_STRIDE,
            center_loss_weight=ih.CENTER_LOSS_WEIGHT,
            offset_loss_weight=ih.OFFSET_LOSS_WEIGHT,
            stuff_area=cfg.MODEL.PANOPTIC_DEEPLAB.STUFF_AREA,
            center_threshold=cfg.MODEL.PANOPTIC_DEEPLAB.CENTER_THRESHOLD,
            nms_kernel=cfg.MODEL.PANOPTIC_DEEPLAB.NMS_KERNEL,
            top_k_instances=cfg.MODEL.PANOPTIC_DEEPLAB.TOP_K_INSTANCE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        features = self.backbone(images)
        sem_logits, sem_losses = self.sem_seg_head(
            features,
            batch.get("gt_sem_seg"),
            train=train,
            weights=batch.get("gt_sem_weight"),
        )
        center, offset = self.ins_embed_head(features, train=train)

        if train:
            losses = dict(sem_losses)
            # center: MSE vs gaussian heatmap; offset: L1 within things
            s = self.common_stride
            gt_center = batch["gt_center"][:, ::s, ::s][
                :, : center.shape[1], : center.shape[2]
            ]
            gt_offset = batch["gt_offset"][:, ::s, ::s][
                :, : offset.shape[1], : offset.shape[2]
            ]
            offset_weight = batch["gt_offset_weight"][:, ::s, ::s][
                :, : offset.shape[1], : offset.shape[2]
            ]
            losses["loss_center"] = (
                jnp.mean((center - gt_center) ** 2) * self.center_loss_weight
            )
            l1 = jnp.abs(offset - gt_offset).sum(-1)
            losses["loss_offset"] = (
                jnp.sum(l1 * offset_weight)
                / jnp.maximum(jnp.sum(offset_weight), 1.0)
                * self.offset_loss_weight
            )
            return losses

        h, w = batch["image"].shape[1], batch["image"].shape[2]
        sem_up = interpolate_bilinear(sem_logits, (h, w))
        center_up = interpolate_bilinear(center[..., None], (h, w))[..., 0]
        offset_up = interpolate_bilinear(offset, (h, w)) * self.common_stride
        return {
            "sem_seg": jnp.argmax(sem_up, -1).astype(jnp.int32),
            "sem_seg_logits": sem_up,
            "center": center_up,
            "offset": offset_up,
        }

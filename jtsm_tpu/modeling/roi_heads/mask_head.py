"""Mask head (reference: detectron2/modeling/roi_heads/mask_head.py —
``MaskRCNNConvUpsampleHead``, ``mask_rcnn_loss``, ``mask_rcnn_inference``).

TPU re-design of mask targets: GT masks arrive as fixed-size crops
rasterized within each GT box by the data pipeline (``gt_mask_crops``,
(G, M, M)); per-proposal 28x28 targets are produced on device by resampling
the matched crop under the proposal->gt-box affine map. With M >= 4x the
target size this matches the reference's polygon rasterization within
quantization noise.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ConvTranspose2d, ShapeSpec, get_norm
from ...ops.losses import binary_cross_entropy_with_logits
from ...structures.masks import crop_and_resize_masks
from ...utils.registry import Registry

ROI_MASK_HEAD_REGISTRY = Registry("ROI_MASK_HEAD")

Array = jax.Array

# reference mask_head.py ``BaseMaskRCNNHead``: the subclassing base for
# custom mask heads. Here custom heads are plain flax modules registered in
# ROI_MASK_HEAD_REGISTRY; the name is kept so reference-style code
# (``class MyHead(BaseMaskRCNNHead)``) ports directly.
BaseMaskRCNNHead = nn.Module


@ROI_MASK_HEAD_REGISTRY.register()
class MaskRCNNConvUpsampleHead(nn.Module):
    num_classes: int
    num_conv: int = 4
    conv_dim: int = 256
    norm: str = ""
    cls_agnostic_mask: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (N, S, S, C) -> logits (N, 2S, 2S, K)."""
        for i in range(self.num_conv):
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                name=f"mask_fcn{i + 1}",
            )(x)
        x = ConvTranspose2d(
            features=self.conv_dim, kernel_size=2, stride=2, dtype=self.dtype, name="deconv"
        )(x)
        x = nn.relu(x)
        k = 1 if self.cls_agnostic_mask else self.num_classes
        x = Conv2d(
            features=k,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x)
        # stay in compute dtype: upcasting the full (N, S, S, K) logits
        # materializes 2x the bytes for zero precision (values are already
        # compute-dtype-rounded); loss/inference cast AFTER class-select
        return x

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: ShapeSpec):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            num_conv=cfg.MODEL.ROI_MASK_HEAD.NUM_CONV,
            conv_dim=cfg.MODEL.ROI_MASK_HEAD.CONV_DIM,
            norm=cfg.MODEL.ROI_MASK_HEAD.NORM,
            cls_agnostic_mask=cfg.MODEL.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK,
            dtype=dtype,
        )


def build_mask_head(cfg: CfgNode, input_shape: ShapeSpec):
    name = cfg.MODEL.ROI_MASK_HEAD.NAME
    cls_ = ROI_MASK_HEAD_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, input_shape))


def mask_targets_from_crops(
    gt_mask_crops: Array,  # (G, M, M) bool/float per-gt-box rasterized masks
    gt_boxes: Array,  # (G, 4)
    matched_idx: Array,  # (N,) matched gt per proposal
    proposal_boxes: Array,  # (N, 4)
    mask_size: int,
) -> Array:
    """Per-proposal (N, S, S) float targets."""
    m = gt_mask_crops.shape[-1]
    crops = gt_mask_crops[matched_idx].astype(jnp.float32)  # (N, M, M)
    gb = gt_boxes[matched_idx]  # (N, 4)
    # proposal box in the crop's coordinate frame
    gw = jnp.maximum(gb[:, 2] - gb[:, 0], 1e-6)
    gh = jnp.maximum(gb[:, 3] - gb[:, 1], 1e-6)
    rel = jnp.stack(
        [
            (proposal_boxes[:, 0] - gb[:, 0]) / gw * m,
            (proposal_boxes[:, 1] - gb[:, 1]) / gh * m,
            (proposal_boxes[:, 2] - gb[:, 0]) / gw * m,
            (proposal_boxes[:, 3] - gb[:, 1]) / gh * m,
        ],
        axis=1,
    )
    return crop_and_resize_masks(crops, rel, mask_size)


def mask_rcnn_loss(
    mask_logits: Array,  # (N, S, S, K)
    gt_classes: Array,  # (N,)
    mask_targets: Array,  # (N, S, S) float in [0, 1]
    fg_valid: Array,  # (N,) which rows participate
    cls_agnostic: bool = False,
) -> Array:
    """Reference mask_head.py ``mask_rcnn_loss`` — mean BCE over fg rois."""
    if cls_agnostic or mask_logits.shape[-1] == 1:
        logits = mask_logits[..., 0]
    else:
        k = mask_logits.shape[-1]
        idx = jnp.clip(gt_classes, 0, k - 1)
        logits = jnp.take_along_axis(
            mask_logits, idx[:, None, None, None], axis=-1
        )[..., 0]
    logits = logits.astype(jnp.float32)
    per_px = binary_cross_entropy_with_logits(logits, (mask_targets >= 0.5).astype(jnp.float32))
    per_roi = per_px.mean(axis=(1, 2))
    fg_f = fg_valid.astype(jnp.float32)
    return jnp.sum(per_roi * fg_f) / jnp.maximum(jnp.sum(fg_f), 1.0)


def mask_rcnn_inference(mask_logits: Array, pred_classes: Array) -> Array:
    """(N, S, S, K) + (N,) -> (N, S, S) probabilities of each roi's class."""
    if mask_logits.shape[-1] == 1:
        sel = mask_logits[..., 0]
    else:
        k = mask_logits.shape[-1]
        idx = jnp.clip(pred_classes, 0, k - 1)
        sel = jnp.take_along_axis(mask_logits, idx[:, None, None, None], axis=-1)[..., 0]
    return jax.nn.sigmoid(sel.astype(jnp.float32))

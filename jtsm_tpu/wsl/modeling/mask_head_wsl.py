"""WSL mask heads (reference: projects/WSL/wsl/modeling/roi_heads/mask_head.py).

The WSL variants differ from the standard Mask R-CNN head in two ways:
- ``layers()`` returns (logits, pre-predictor features) so downstream heads
  can reuse the mask trunk (reference mask_head.py:339).
- two extra losses: plain BCE over PGT mask targets (:24 ``mask_rcnn_loss``)
  and the score-consistency "co-loss" (:107 ``mask_rcnn_co_loss``) that
  matches a smooth-max of the predicted mask against the PGT confidence
  score of the mined instance.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ConvTranspose2d, ShapeSpec
from ...modeling.roi_heads.mask_head import ROI_MASK_HEAD_REGISTRY

Array = jax.Array


@ROI_MASK_HEAD_REGISTRY.register()
class MaskRCNNConvUpsampleWSLHead(nn.Module):
    """conv x N -> deconv 2x -> 1x1 predictor; returns (logits, features)
    (reference mask_head.py:267)."""

    num_classes: int
    num_conv: int = 4
    conv_dim: int = 256
    norm: str = ""
    cls_agnostic_mask: bool = False
    dtype: Any = jnp.float32

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

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
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
        feats = nn.relu(x)
        k = 1 if self.cls_agnostic_mask else self.num_classes
        logits = Conv2d(
            features=k,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(feats)
        return logits.astype(jnp.float32), feats


@ROI_MASK_HEAD_REGISTRY.register()
class MaskRCNNUpsampleWSLHead(MaskRCNNConvUpsampleWSLHead):
    """deconv-only variant (reference mask_head.py:350): no conv trunk."""

    num_conv: int = 0


@ROI_MASK_HEAD_REGISTRY.register()
class MaskRCNNWSLHead(MaskRCNNConvUpsampleWSLHead):
    """conv-trunk-only variant without upsampling is modeled by num_conv
    convs + deconv in the reference fork's default config; kept as an alias
    with the standard trunk (reference mask_head.py:430)."""


def mask_rcnn_loss_wsl(
    mask_logits: Array,  # (N, S, S, K) or (N, S, S, 1)
    gt_classes: Array,  # (N,)
    gt_masks: Array,  # (N, S, S) float or bool
    valid: Array,  # (N,)
) -> Array:
    """Per-pixel BCE at the gt class channel (reference mask_head.py:24).
    Matches the core mask_rcnn_loss; restated here because the WSL head's
    targets are PGT crops (already rasterized to (S, S))."""
    n, s, _, k = mask_logits.shape
    if k == 1:
        sel = mask_logits[..., 0]
    else:
        cls = jnp.clip(gt_classes, 0, k - 1)
        sel = jnp.take_along_axis(
            mask_logits, cls[:, None, None, None], axis=-1
        )[..., 0]
    gt = gt_masks.astype(jnp.float32)
    per_pix = jnp.maximum(sel, 0) - sel * gt + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    w = valid.astype(jnp.float32)[:, None, None]
    return jnp.sum(per_pix * w) / jnp.maximum(jnp.sum(w) * s * s, 1.0)


def mask_rcnn_co_loss(
    mask_logits: Array,  # (N, S, S, K)
    gt_classes: Array,  # (N,)
    gt_scores: Array,  # (N,) PGT confidence per mined instance
    valid: Array,  # (N,)
    r: float = 5.0,
) -> Array:
    """Score-consistency loss (reference mask_head.py:107): the smooth max
    (logsumexp with temperature r, normalized by log(h*w)/r) of the
    predicted mask probability should equal the PGT instance score."""
    n, h, w, k = mask_logits.shape
    if k == 1:
        sel = mask_logits[..., 0]
    else:
        cls = jnp.clip(gt_classes, 0, k - 1)
        sel = jnp.take_along_axis(
            mask_logits, cls[:, None, None, None], axis=-1
        )[..., 0]
    probs = jax.nn.sigmoid(sel)
    pred_scores = (
        jax.nn.logsumexp(probs * r, axis=(1, 2)) / r - math.log(h * w) / r
    )
    dist = jnp.abs(pred_scores - gt_scores)
    vw = valid.astype(jnp.float32)
    return jnp.sum(dist * vw) / jnp.maximum(jnp.sum(vw), 1.0)

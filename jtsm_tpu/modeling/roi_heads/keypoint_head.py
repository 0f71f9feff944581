"""Keypoint head (reference: detectron2/modeling/roi_heads/keypoint_head.py
``KRCNNConvDeconvUpsampleHead``, heatmap CE loss, ``keypoint_rcnn_inference``)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ConvTranspose2d, ShapeSpec, interpolate_bilinear
from ...ops.losses import softmax_cross_entropy
from ...structures.keypoints import heatmaps_to_keypoints, keypoints_to_heatmap
from ...utils.registry import Registry

ROI_KEYPOINT_HEAD_REGISTRY = Registry("ROI_KEYPOINT_HEAD")

Array = jax.Array


@ROI_KEYPOINT_HEAD_REGISTRY.register()
class KRCNNConvDeconvUpsampleHead(nn.Module):
    num_keypoints: int = 17
    conv_dims: Sequence[int] = tuple(512 for _ in range(8))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """(N, S, S, C) -> heatmap logits (N, 4S, 4S, K)."""
        for i, dim in enumerate(self.conv_dims):
            x = Conv2d(
                features=dim,
                kernel_size=3,
                padding=1,
                activation=nn.relu,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                name=f"conv_fcn{i + 1}",
            )(x)
        x = ConvTranspose2d(
            features=self.num_keypoints, kernel_size=4, stride=2, dtype=self.dtype, name="score_lowres"
        )(x)
        # 2x bilinear upsample (reference: interpolate scale_factor=2)
        x = interpolate_bilinear(
            x.astype(jnp.float32), (x.shape[1] * 2, x.shape[2] * 2), align_corners=False
        )
        return x

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: ShapeSpec):
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
            conv_dims=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS),
            dtype=dtype,
        )


def build_keypoint_head(cfg: CfgNode, input_shape: ShapeSpec):
    name = cfg.MODEL.ROI_KEYPOINT_HEAD.NAME
    cls_ = ROI_KEYPOINT_HEAD_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, input_shape))


def keypoint_rcnn_loss(
    keypoint_logits: Array,  # (N, S, S, K)
    gt_keypoints: Array,  # (N, K, 3)
    proposal_boxes: Array,  # (N, 4)
    fg_valid: Array,  # (N,)
    normalize_by_visible: bool = True,
) -> Array:
    """Heatmap CE at the gt keypoint bins (reference keypoint_head.py loss)."""
    n, s, _, k = keypoint_logits.shape
    heatmaps, valid = keypoints_to_heatmap(gt_keypoints, proposal_boxes, s)
    # logits per roi/keypoint: (N, K, S*S)
    logits = keypoint_logits.transpose(0, 3, 1, 2).reshape(n, k, s * s)
    ce = softmax_cross_entropy(logits, heatmaps)  # (N, K)
    w = valid.astype(jnp.float32) * fg_valid[:, None].astype(jnp.float32)
    total = jnp.sum(ce * w)
    if normalize_by_visible:
        return total / jnp.maximum(jnp.sum(w), 1.0)
    return total / jnp.maximum(jnp.sum(fg_valid), 1.0)


def keypoint_rcnn_inference(keypoint_logits: Array, pred_boxes: Array) -> Array:
    """(N, S, S, K) -> (N, K, 4) image-space keypoints (x, y, logit, prob)."""
    maps = keypoint_logits.transpose(0, 3, 1, 2)  # (N, K, S, S)
    return heatmaps_to_keypoints(maps, pred_boxes)


# reference keypoint_head.py:135 ``BaseKeypointRCNNHead`` — subclassing base;
# flax modules need no shared base beyond nn.Module (same as BaseMaskRCNNHead).
BaseKeypointRCNNHead = nn.Module

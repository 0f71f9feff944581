"""Fast R-CNN output layers, losses and static-shape inference.

Reference: detectron2/modeling/roi_heads/fast_rcnn.py:46
(``fast_rcnn_inference``), :144 (``FastRCNNOutputs`` losses), :369
(``FastRCNNOutputLayers``).

Static-shape notes: inference keeps a fixed candidate budget (top
``nms_candidates`` over the R x K score grid after thresholding) and returns
fixed (DETECTIONS_PER_IMAGE,) arrays with a validity mask.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Linear
from ...ops.box_regression import Box2BoxTransform
from ...ops.losses import giou_loss, smooth_l1_loss, softmax_cross_entropy
from ...ops.nms import batched_nms_mask
from ...structures.boxes import clip_boxes, nonempty_boxes

Array = jax.Array


class FastRCNNOutputLayers(nn.Module):
    """Two linear heads: (K+1)-way classification and per-class box deltas."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    box_dim: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        scores = Linear(
            features=self.num_classes + 1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        num_bbox_reg_classes = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = Linear(
            features=num_bbox_reg_classes * self.box_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


def fast_rcnn_losses(
    scores: Array,  # (N, K+1)
    deltas: Array,  # (N, K*4) or (N, 4)
    proposal_boxes: Array,  # (N, 4)
    gt_classes: Array,  # (N,) in [0, K]; K = background
    gt_boxes: Array,  # (N, 4) matched gt box per proposal
    valid: Array,  # (N,) sampled-proposal validity
    box2box_transform: Box2BoxTransform,
    num_classes: int,
    smooth_l1_beta: float = 0.0,
    box_reg_loss_type: str = "smooth_l1",
) -> Dict[str, Array]:
    """Reference fast_rcnn.py:144 — softmax CE + fg box regression, both
    normalized by the total number of sampled proposals."""
    valid_f = valid.astype(jnp.float32)
    normalizer = jnp.maximum(jnp.sum(valid_f), 1.0)

    ce = softmax_cross_entropy(scores, gt_classes)
    loss_cls = jnp.sum(ce * valid_f) / normalizer

    fg = valid & (gt_classes >= 0) & (gt_classes < num_classes)
    fg_f = fg.astype(jnp.float32)
    # select the delta columns of the gt class (or the single agnostic column)
    if deltas.shape[-1] == 4:
        sel_deltas = deltas
    else:
        d = deltas.reshape(deltas.shape[0], -1, 4)
        cls_idx = jnp.clip(gt_classes, 0, d.shape[1] - 1)
        sel_deltas = jnp.take_along_axis(d, cls_idx[:, None, None], axis=1)[:, 0]

    if box_reg_loss_type == "smooth_l1":
        target_deltas = box2box_transform.get_deltas(proposal_boxes, gt_boxes)
        reg = smooth_l1_loss(sel_deltas, target_deltas, smooth_l1_beta).sum(-1)
    else:
        pred = box2box_transform.apply_deltas(sel_deltas, proposal_boxes)
        reg = giou_loss(pred, gt_boxes)
    loss_box = jnp.sum(reg * fg_f) / normalizer
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def fast_rcnn_inference_single(
    scores: Array,  # (R, K+1) raw logits
    deltas: Array,  # (R, K*4) or (R, 4)
    proposal_boxes: Array,  # (R, 4)
    proposal_valid: Array,  # (R,)
    image_size: Array,  # (2,)
    box2box_transform: Box2BoxTransform,
    num_classes: int,
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    nms_candidates: int = 1024,
) -> Dict[str, Array]:
    """Per-image inference -> fixed (topk_per_image,) detections + valid mask.

    Reference fast_rcnn.py:46: per-class threshold -> batched NMS -> topk.
    """
    r = scores.shape[0]
    probs = jax.nn.softmax(scores, axis=-1)[:, :num_classes]  # (R, K)

    if deltas.shape[-1] == 4:
        boxes = box2box_transform.apply_deltas(deltas, proposal_boxes)
        boxes = clip_boxes(boxes, image_size)
        boxes_per_class = jnp.broadcast_to(boxes[:, None, :], (r, num_classes, 4))
    else:
        decoded = box2box_transform.apply_deltas(deltas, proposal_boxes)  # (R, K*4)
        boxes_per_class = clip_boxes(decoded.reshape(r, num_classes, 4), image_size)

    flat_scores = probs.reshape(-1)  # (R*K,)
    flat_boxes = boxes_per_class.reshape(-1, 4)
    flat_classes = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (r,))
    keepable = (
        (probs > score_thresh).reshape(-1)
        & jnp.repeat(proposal_valid, num_classes)
        & nonempty_boxes(flat_boxes)
    )
    flat_scores = jnp.where(keepable, flat_scores, -jnp.inf)

    c = min(nms_candidates, flat_scores.shape[0])
    cand_scores, cand_idx = jax.lax.top_k(flat_scores, c)
    cand_boxes = flat_boxes[cand_idx]
    cand_classes = flat_classes[cand_idx]

    keep = batched_nms_mask(cand_boxes, cand_scores, cand_classes, nms_thresh)
    final_scores = jnp.where(keep, cand_scores, -jnp.inf)
    k = min(topk_per_image, c)
    top_scores, top_i = jax.lax.top_k(final_scores, k)
    out_valid = jnp.isfinite(top_scores)
    out = {
        "boxes": cand_boxes[top_i],
        "scores": jnp.where(out_valid, top_scores, 0.0),
        "classes": cand_classes[top_i],
        "valid": out_valid,
    }
    if topk_per_image > k:
        pad = topk_per_image - k
        out = {
            "boxes": jnp.concatenate([out["boxes"], jnp.zeros((pad, 4))]),
            "scores": jnp.concatenate([out["scores"], jnp.zeros((pad,))]),
            "classes": jnp.concatenate([out["classes"], jnp.zeros((pad,), jnp.int32)]),
            "valid": jnp.concatenate([out["valid"], jnp.zeros((pad,), bool)]),
        }
    return out

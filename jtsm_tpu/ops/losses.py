"""Loss functions used across the modeling zoo.

Reference: fvcore smooth_l1/giou losses used by detectron2 RPN/Fast R-CNN
(`proposal_generator/rpn.py`, `roi_heads/fast_rcnn.py:144`) and
``sigmoid_focal_loss`` from `meta_arch/retinanet.py:40`.
All are elementwise-jnp, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smooth_l1_loss(pred: Array, target: Array, beta: float) -> Array:
    """Per-element smooth-l1 (Huber); beta=0 degrades to pure L1 like fvcore."""
    diff = jnp.abs(pred - target)
    if beta < 1e-5:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def giou_loss(pred_boxes: Array, target_boxes: Array) -> Array:
    """Per-box GIoU loss on aligned (..., 4) XYXY arrays."""
    px0, py0, px1, py1 = (pred_boxes[..., i] for i in range(4))
    tx0, ty0, tx1, ty1 = (target_boxes[..., i] for i in range(4))

    # intersect
    ix0 = jnp.maximum(px0, tx0)
    iy0 = jnp.maximum(py0, ty0)
    ix1 = jnp.minimum(px1, tx1)
    iy1 = jnp.minimum(py1, ty1)
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)

    ap = jnp.clip(px1 - px0, 0) * jnp.clip(py1 - py0, 0)
    at = jnp.clip(tx1 - tx0, 0) * jnp.clip(ty1 - ty0, 0)
    union = ap + at - inter
    iou = inter / jnp.maximum(union, 1e-7)

    # smallest enclosing box
    cx0 = jnp.minimum(px0, tx0)
    cy0 = jnp.minimum(py0, ty0)
    cx1 = jnp.maximum(px1, tx1)
    cy1 = jnp.maximum(py1, ty1)
    area_c = (cx1 - cx0) * (cy1 - cy0)
    giou = iou - (area_c - union) / jnp.maximum(area_c, 1e-7)
    return 1.0 - giou


def sigmoid_focal_loss(
    logits: Array, targets: Array, alpha: float = 0.25, gamma: float = 2.0
) -> Array:
    """Per-element focal loss; targets in {0, 1}."""
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically stable binary CE with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


binary_cross_entropy_with_logits = _bce_with_logits


def softmax_cross_entropy(logits: Array, labels: Array) -> Array:
    """Per-row CE for int labels (out-of-range labels give garbage — mask
    them on the caller side, the static-shape idiom)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(
        logits, jnp.clip(labels, 0, logits.shape[-1] - 1)[..., None], axis=-1
    )[..., 0]
    return logz - label_logit

"""Proposal selection utilities (reference:
detectron2/modeling/proposal_generator/proposal_utils.py
``find_top_rpn_proposals``, ``add_ground_truth_to_proposals``).

Static-shape re-design: every stage works on fixed-K arrays with -inf score
padding; "removing" a box = setting its score to -inf. The returned proposal
set is always (POST_NMS_TOPK, 4) + validity mask.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ...ops.nms import nms_mask
from ...structures.boxes import clip_boxes, nonempty_boxes

Array = jax.Array


def find_top_rpn_proposals_single(
    proposals: List[Array],  # per level (Ni, 4) decoded boxes for ONE image
    scores: List[Array],  # per level (Ni,) objectness logits
    image_size: Array,  # (2,) true (h, w)
    nms_thresh: float,
    pre_nms_topk: int,
    post_nms_topk: int,
    min_box_size: float,
) -> Tuple[Array, Array]:
    """Returns (post_nms_topk, 4) boxes and (post_nms_topk,) scores with
    -inf marking padding."""
    # Reference semantics: per-level topk then one batched NMS keyed by level
    # id, which never cross-suppresses — i.e. *independent per-level NMS*.
    # We exploit that: stack levels into a (L, K) problem and vmap one NMS
    # over it, which bounds the IoU matrix at K x K per level instead of
    # (L*K)^2 (the latter OOMs HBM at batch 8).
    k_cap = min(pre_nms_topk, max(s.shape[0] for s in scores))
    lvl_boxes = []
    lvl_scores = []
    for b, s in zip(proposals, scores):
        n = s.shape[0]
        k = min(pre_nms_topk, n)
        topv, topi = jax.lax.top_k(s, k)
        bb = b[topi]
        bb = clip_boxes(bb, image_size)
        valid = nonempty_boxes(bb, min_box_size)
        # replace NaN/Inf garbage like the reference's training guard
        finite = jnp.all(jnp.isfinite(bb), axis=-1)
        topv = jnp.where(valid & finite, topv, -jnp.inf)
        if k < k_cap:
            bb = jnp.concatenate([bb, jnp.zeros((k_cap - k, 4), bb.dtype)])
            topv = jnp.concatenate([topv, jnp.full((k_cap - k,), -jnp.inf)])
        lvl_boxes.append(bb)
        lvl_scores.append(topv)

    stacked_boxes = jnp.stack(lvl_boxes)  # (L, K, 4)
    stacked_scores = jnp.stack(lvl_scores)  # (L, K)

    keep = jax.vmap(nms_mask, in_axes=(0, 0, None))(
        stacked_boxes, stacked_scores, nms_thresh
    )
    masked = jnp.where(keep, stacked_scores, -jnp.inf).reshape(-1)
    all_boxes = stacked_boxes.reshape(-1, 4)
    k = min(post_nms_topk, masked.shape[0])
    top_scores, idx = jax.lax.top_k(masked, k)
    top_boxes = all_boxes[idx]
    if post_nms_topk > k:
        pad = post_nms_topk - k
        top_boxes = jnp.concatenate([top_boxes, jnp.zeros((pad, 4), top_boxes.dtype)])
        top_scores = jnp.concatenate([top_scores, jnp.full((pad,), -jnp.inf)])
    return top_boxes, top_scores


def add_ground_truth_to_proposals(
    gt_boxes: Array,  # (G, 4)
    gt_valid: Array,  # (G,)
    proposals: Array,  # (K, 4)
    scores: Array,  # (K,)
) -> Tuple[Array, Array]:
    """Append GT boxes as high-confidence proposals
    (reference proposal_utils.py add_ground_truth_to_proposals: logit ~ high).
    Padded GT rows get -inf scores so downstream masking drops them."""
    gt_logit = jnp.where(gt_valid, 10.0, -jnp.inf)
    out_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    out_scores = jnp.concatenate([scores, gt_logit], axis=0)
    return out_boxes, out_scores

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

from ...ops.nms import batched_nms_mask
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
    sel_boxes = []
    sel_scores = []
    sel_levels = []
    for lvl, (b, s) in enumerate(zip(proposals, scores)):
        n = s.shape[0]
        k = min(pre_nms_topk, n)
        topv, topi = jax.lax.top_k(s, k)
        bb = b[topi]
        bb = clip_boxes(bb, image_size)
        valid = nonempty_boxes(bb, min_box_size)
        # replace NaN/Inf garbage like the reference's training guard
        finite = jnp.all(jnp.isfinite(bb), axis=-1)
        topv = jnp.where(valid & finite, topv, -jnp.inf)
        sel_boxes.append(bb)
        sel_scores.append(topv)
        sel_levels.append(jnp.full((k,), lvl, dtype=jnp.int32))

    all_boxes = jnp.concatenate(sel_boxes, axis=0)
    all_scores = jnp.concatenate(sel_scores, axis=0)
    all_levels = jnp.concatenate(sel_levels, axis=0)

    keep = batched_nms_mask(all_boxes, all_scores, all_levels, nms_thresh)
    masked = jnp.where(keep, all_scores, -jnp.inf)
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

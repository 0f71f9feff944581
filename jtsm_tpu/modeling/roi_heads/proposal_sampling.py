"""Proposal labeling + sampling for the second stage, single image.

Reference: detectron2/modeling/roi_heads/roi_heads.py:123
``label_and_sample_proposals`` (+ gt append). Static-shape version: always
returns exactly ``batch_size_per_image`` slots with a validity mask.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.matcher import Matcher
from ...ops.sampling import subsample_labels
from ...structures.boxes import pairwise_iou
from ..proposal_generator.proposal_utils import add_ground_truth_to_proposals

Array = jax.Array


def sample_proposals_single(
    rng: Array,
    proposals: Array,  # (K, 4)
    proposal_scores: Array,  # (K,) with -inf padding
    gt_boxes: Array,  # (G, 4)
    gt_classes: Array,  # (G,)
    gt_valid: Array,  # (G,)
    *,
    num_classes: int,
    batch_size_per_image: int,
    positive_fraction: float,
    matcher: Matcher,
    append_gt: bool = True,
) -> Dict[str, Array]:
    if append_gt:
        proposals, proposal_scores = add_ground_truth_to_proposals(
            gt_boxes, gt_valid, proposals, proposal_scores
        )
    n = proposals.shape[0]
    prop_valid = jnp.isfinite(proposal_scores)

    iou = pairwise_iou(gt_boxes, proposals)  # (G, N)
    iou = jnp.where(prop_valid[None, :], iou, -1.0)
    matched_idx, matched_labels = matcher(iou, gt_valid=gt_valid)

    classes = jnp.where(
        matched_labels == 1, gt_classes[matched_idx], num_classes
    ).astype(jnp.int32)

    sample_lbl = jnp.where(
        ~prop_valid,
        -1,
        jnp.where(matched_labels == 1, 1, jnp.where(matched_labels == 0, 0, -1)),
    ).astype(jnp.int32)

    rng_sub, rng_tie = jax.random.split(rng)
    pos_mask, neg_mask = subsample_labels(
        rng_sub, sample_lbl, batch_size_per_image, positive_fraction, bg_label=0
    )

    u = jax.random.uniform(rng_tie, (n,))
    priority = jnp.where(pos_mask, 2.0 + u, jnp.where(neg_mask, 1.0 + u, -jnp.inf))
    vals, idx = jax.lax.top_k(priority, batch_size_per_image)
    valid = jnp.isfinite(vals)

    sel_classes = jnp.where(valid, classes[idx], num_classes)
    return {
        "boxes": proposals[idx],
        "gt_classes": sel_classes,
        "gt_boxes": gt_boxes[matched_idx[idx]],
        "matched_idx": matched_idx[idx],
        "valid": valid,
        "fg": valid & (sel_classes < num_classes),
    }

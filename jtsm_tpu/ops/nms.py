"""Static-shape NMS for TPU.

Reference: detectron2/layers/nms.py:10 (``batched_nms`` with the class-offset
trick) and the `nms_rotated` native op. TPU re-design: instead of returning a
dynamic list of kept indices (impossible under jit), NMS returns a **boolean
keep mask** over the fixed-size input. Callers combine it with ``top_k`` for
fixed-capacity outputs (SURVEY.md §7 "NMS with fixed K").

The greedy algorithm is inherently sequential; we run it as a
``lax.fori_loop`` over score-sorted boxes where each step is a cheap vector
op. Under ``vmap`` the loop executes in lockstep across the batch, so the
sequential cost amortizes over all images/classes at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou
from ..structures.rotated_boxes import pairwise_iou_rotated

Array = jax.Array


def nms_mask(boxes: Array, scores: Array, iou_threshold: float) -> Array:
    """Greedy NMS returning a bool keep mask aligned with the input order.

    Boxes with score == -inf are treated as padding and never kept.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    valid_sorted = jnp.isfinite(scores[order])

    iou = pairwise_iou(boxes_sorted, boxes_sorted)
    suppress_later = iou > iou_threshold  # (i suppresses j) candidates
    arange = jnp.arange(n)

    def body(i, keep):
        # if box i survives, it suppresses all later boxes with IoU > t
        row = suppress_later[i] & (arange > i) & keep[i]
        return keep & ~row

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_sorted)
    # unsort
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def nms(boxes: Array, scores: Array, iou_threshold: float, max_out: int | None = None):
    """API-parity wrapper: returns indices of kept boxes sorted by score,
    padded with -1 up to ``max_out`` (or N)."""
    n = boxes.shape[0]
    keep = nms_mask(boxes, scores, iou_threshold)
    k = n if max_out is None else max_out
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, idxs = jax.lax.top_k(masked_scores, min(k, n))
    out = jnp.where(jnp.isfinite(top_scores), idxs, -1)
    if k > n:
        out = jnp.concatenate([out, jnp.full((k - n,), -1, out.dtype)])
    return out


def batched_nms_mask(
    boxes: Array, scores: Array, idxs: Array, iou_threshold: float
) -> Array:
    """Class-aware NMS via the coordinate-offset trick
    (reference layers/nms.py:10): boxes of different categories are shifted
    to disjoint regions so one NMS pass never cross-suppresses."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold)


def batched_nms(
    boxes: Array, scores: Array, idxs: Array, iou_threshold: float, max_out: int | None = None
):
    n = boxes.shape[0]
    keep = batched_nms_mask(boxes, scores, idxs, iou_threshold)
    k = n if max_out is None else max_out
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, min(k, n))
    out = jnp.where(jnp.isfinite(top_scores), top_idx, -1)
    if k > n:
        out = jnp.concatenate([out, jnp.full((k - n,), -1, out.dtype)])
    return out


# ---------------------------------------------------------------------------
# Rotated NMS (reference: layers/csrc/nms_rotated/)
# ---------------------------------------------------------------------------


def nms_rotated_mask(boxes: Array, scores: Array, iou_threshold: float) -> Array:
    """Greedy NMS on (N, 5) rotated boxes using exact rotated IoU."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    valid_sorted = jnp.isfinite(scores[order])

    iou = pairwise_iou_rotated(boxes_sorted, boxes_sorted)
    suppress_later = iou > iou_threshold
    arange = jnp.arange(n)

    def body(i, keep):
        row = suppress_later[i] & (arange > i) & keep[i]
        return keep & ~row

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_sorted)
    return jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)


def batched_nms_rotated_mask(
    boxes: Array, scores: Array, idxs: Array, iou_threshold: float
) -> Array:
    """Reference layers/nms.py:103 — offset rotated centers per class."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    finite = jnp.isfinite(scores)[:, None]
    max_coord = jnp.max(
        jnp.where(finite, boxes[:, :2] + boxes[:, 2:4] / 2, 0.0)
    ) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes.at[:, :2].add(offsets[:, None])
    return nms_rotated_mask(shifted, scores, iou_threshold)

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


def _iou_matrix(boxes: Array) -> Array:
    """(N, 4) -> (N, N) IoU without (N, N, 2) stack intermediates (keeps the
    peak buffer at one N x N plane — matters under vmap)."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    iw = jnp.clip(
        jnp.minimum(x1[:, None], x1[None, :]) - jnp.maximum(x0[:, None], x0[None, :]), 0
    )
    ih = jnp.clip(
        jnp.minimum(y1[:, None], y1[None, :]) - jnp.maximum(y0[:, None], y0[None, :]), 0
    )
    inter = iw * ih
    area = (x1 - x0) * (y1 - y0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_mask_sequential(boxes: Array, scores: Array, iou_threshold: float) -> Array:
    """Straightforward greedy NMS: one fori_loop step per box. Exact but
    O(N) sequential steps — kept as the reference implementation for tests."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    valid_sorted = jnp.isfinite(scores[order])

    suppress_later = _iou_matrix(boxes_sorted) > iou_threshold
    arange = jnp.arange(n)

    def body(i, keep):
        # if box i survives, it suppresses all later boxes with IoU > t
        row = suppress_later[i] & (arange > i) & keep[i]
        return keep & ~row

    keep_sorted = jax.lax.fori_loop(0, n, body, valid_sorted)
    # unsort
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def _resolve_tile(iou_gt: Array, valid: Array) -> Array:
    """Exact greedy survivors within one tile.

    iou_gt: (T, T) bool, iou > threshold with i-suppresses-j restricted to
    i < j (strict upper triangle). Monotone fixpoint: repeatedly (a) find
    rows that are *definitely alive* (no incoming edge from any non-dead
    row), (b) mark everything they suppress as dead. Each iteration resolves
    at least one chain level, so it converges in <= suppression-chain depth
    (typically a handful), exactly matching sequential greedy NMS.
    """
    t = iou_gt.shape[0]

    def cond(state):
        dead, definitely_alive, changed = state
        return changed

    def body(state):
        dead, definitely_alive, _ = state
        candidates = valid & ~dead
        incoming = jnp.any(iou_gt & candidates[:, None], axis=0)
        new_alive = candidates & ~incoming
        newly_dead = jnp.any(iou_gt & (definitely_alive | new_alive)[:, None], axis=0)
        new_dead = dead | (newly_dead & ~new_alive & valid)
        changed = jnp.any(new_dead != dead) | jnp.any(new_alive & ~definitely_alive)
        return new_dead, definitely_alive | new_alive, changed

    dead0 = jnp.zeros((t,), bool)
    alive0 = jnp.zeros((t,), bool)
    dead, alive, _ = jax.lax.while_loop(cond, body, (dead0, alive0, jnp.asarray(True)))
    return valid & ~dead


def nms_mask(boxes: Array, scores: Array, iou_threshold: float, tile: int = 128) -> Array:
    """Exact greedy NMS with ~N/tile sequential phases instead of N.

    Tiled algorithm (after the TF-TPU `non_max_suppression_padded` idea):
    boxes sorted by score; for each tile in order, (1) resolve survivors
    within the tile via the `_resolve_tile` fixpoint, (2) one vectorized pass
    suppresses every later box overlapping a survivor. Padding boxes carry
    score == -inf and are never kept.
    """
    n = boxes.shape[0]
    if n <= tile:
        order = jnp.argsort(-scores)
        iou_gt = _iou_matrix(boxes[order]) > iou_threshold
        tri = jnp.triu(jnp.ones((n, n), bool), k=1)
        keep_sorted = _resolve_tile(iou_gt & tri, jnp.isfinite(scores[order]))
        return jnp.zeros((n,), bool).at[order].set(keep_sorted)

    pad = (-n) % tile
    if pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)])
        scores = jnp.concatenate([scores, jnp.full((pad,), -jnp.inf, scores.dtype)])
    np_ = n + pad
    num_tiles = np_ // tile

    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    valid0 = jnp.isfinite(scores[order])

    tri = jnp.triu(jnp.ones((tile, tile), bool), k=1)

    def body(i, valid):
        start = i * tile
        tile_boxes = jax.lax.dynamic_slice(boxes_sorted, (start, 0), (tile, 4))
        tile_valid = jax.lax.dynamic_slice(valid, (start,), (tile,))
        iou_gt = (_pair_iou(tile_boxes, tile_boxes) > iou_threshold) & tri
        survivors = _resolve_tile(iou_gt, tile_valid)
        # write survivors back
        valid = jax.lax.dynamic_update_slice(valid, survivors, (start,))
        # suppress all boxes AFTER this tile that overlap a survivor
        cross = _pair_iou(tile_boxes, boxes_sorted) > iou_threshold  # (T, N)
        suppressed = jnp.any(cross & survivors[:, None], axis=0)
        later = jnp.arange(np_) >= (start + tile)
        return valid & ~(suppressed & later)

    keep_sorted = jax.lax.fori_loop(0, num_tiles, body, valid0)
    keep = jnp.zeros((np_,), bool).at[order].set(keep_sorted)
    return keep[:n]


def _pair_iou(a: Array, b: Array) -> Array:
    """(N, 4) x (M, 4) -> (N, M) IoU, lean intermediates."""
    ax0, ay0, ax1, ay1 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bx0, by0, bx1, by1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    iw = jnp.clip(jnp.minimum(ax1[:, None], bx1[None, :]) - jnp.maximum(ax0[:, None], bx0[None, :]), 0)
    ih = jnp.clip(jnp.minimum(ay1[:, None], by1[None, :]) - jnp.maximum(ay0[:, None], by0[None, :]), 0)
    inter = iw * ih
    aa = (ax1 - ax0) * (ay1 - ay0)
    ab = (bx1 - bx0) * (by1 - by0)
    union = aa[:, None] + ab[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


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


def nms_rotated(boxes: Array, scores: Array, iou_threshold: float, max_out: int | None = None):
    """API-parity wrapper (reference layers/nms.py:35 ``nms_rotated``):
    indices of kept rotated boxes sorted by score, -1-padded to ``max_out``."""
    n = boxes.shape[0]
    keep = nms_rotated_mask(boxes, scores, iou_threshold)
    k = n if max_out is None else max_out
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, min(k, n))
    out = jnp.where(jnp.isfinite(top_scores), top_idx, -1)
    if k > n:
        out = jnp.concatenate([out, jnp.full((k - n,), -1, out.dtype)])
    return out


def batched_nms_rotated(
    boxes: Array, scores: Array, idxs: Array, iou_threshold: float, max_out: int | None = None
):
    """API-parity wrapper (reference layers/nms.py:103)."""
    n = boxes.shape[0]
    keep = batched_nms_rotated_mask(boxes, scores, idxs, iou_threshold)
    k = n if max_out is None else max_out
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked_scores, min(k, n))
    out = jnp.where(jnp.isfinite(top_scores), top_idx, -1)
    if k > n:
        out = jnp.concatenate([out, jnp.full((k - n,), -1, out.dtype)])
    return out

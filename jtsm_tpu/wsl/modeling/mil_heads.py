"""MIL scoring heads + pseudo-ground-truth mining, static-shape.

Reference:
* WSDDN scoring / image BCE — projects/WSL/wsl/modeling/roi_heads/
  fast_rcnn_wsddn.py and fast_rcnn_tsm.py:573-586 (``softmax_cls(C) *
  softmax_over_proposals(D)``), :346 (``binary_cross_entropy_loss``),
  :364 (``predict_probs_img``).
* OICR refinement — fast_rcnn_oicr.py:166,563 ((K+1)-way softmax branches,
  weighted CE with PGT weights).
* TSM joint thing+stuff classes — fast_rcnn_tsm.py:436,490-497.
* PGT mining — roi_heads_jtsm.py:1168 (``get_pgt_top_k``), :1038
  (``get_pgt_mist``).

All functions operate on ONE image (vmapped by callers) with fixed R
proposals and validity masks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...layers import Linear
from ...ops.losses import softmax_cross_entropy
from ...ops.nms import nms_mask
from ...structures.boxes import pairwise_iou

Array = jax.Array


class MILOutputLayers(nn.Module):
    """Two linear branches (cls, det) -> WSDDN proposal scores."""

    num_classes: int  # joint classes for TSM (things + stuff - 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        cls_logit = Linear(
            features=self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls",
        )(x).astype(jnp.float32)
        det_logit = Linear(
            features=self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="det",
        )(x).astype(jnp.float32)
        return cls_logit, det_logit


class GAMLayer(nn.Module):
    """Guided attention module (reference fast_rcnn.py:2027
    ``GAMOutputLayers``): a 1x1-conv sigmoid attention map rescales the
    backbone feature as ``(1 + a) * x``, and a second 1x1 conv on the
    attention map global-average-pools to image-level class logits trained
    with BCE vs the image one-hot (``GAMOutputs.losses`` :1986, cfg
    ``WSL.HAS_GAM``)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        """x: (B, H, W, C) -> (attended features, (B, num_classes) logits)."""
        a = nn.Conv(
            x.shape[-1],
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            name="conv6",
        )(x)
        a = jax.nn.sigmoid(a.astype(jnp.float32))
        attended = (1.0 + a).astype(x.dtype) * x
        logits = nn.Conv(
            self.num_classes,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            name="conv7",
        )(a.astype(self.dtype))
        logits = jnp.mean(logits.astype(jnp.float32), axis=(1, 2))
        return attended, logits


def gam_image_loss(logits: Array, image_labels: Array) -> Array:
    """BCE-with-logits, mean reduction (reference WSL.MEAN_LOSS default)."""
    labels = image_labels.astype(jnp.float32)
    bce = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return bce.mean()


def wsddn_scores(cls_logit: Array, det_logit: Array, valid: Array) -> Array:
    """(R, C) x (R, C) -> (R, C) MIL scores: softmax over classes x softmax
    over (valid) proposals."""
    s_cls = jax.nn.softmax(cls_logit, axis=1)
    det_masked = jnp.where(valid[:, None], det_logit, -jnp.inf)
    s_det = jax.nn.softmax(det_masked, axis=0)
    s_det = jnp.where(valid[:, None], s_det, 0.0)
    return s_cls * s_det


def mil_image_loss(
    proposal_scores: Array, image_labels: Array, mean_loss: bool = True
) -> Array:
    """Image-level multi-label BCE (reference fast_rcnn_tsm.py:346):
    image score = sum of proposal scores per class, clamped to (0, 1).
    ``mean_loss`` selects mean-vs-sum reduction over classes (cfg
    ``WSL.MEAN_LOSS``, reference default True; the wsddn/csc WSR yamls set
    False)."""
    img_score = jnp.clip(proposal_scores.sum(axis=0), 1e-6, 1.0 - 1e-6)
    labels = image_labels.astype(jnp.float32)
    bce = -(labels * jnp.log(img_score) + (1 - labels) * jnp.log(1 - img_score))
    return bce.mean() if mean_loss else bce.sum()


class OICROutputLayers(nn.Module):
    """One refinement branch: (K+1)-way classifier (+ optional box reg).

    ``reg_classes`` mirrors the reference's class-specific regression
    default (fast_rcnn_oicr.py:488 ``num_bbox_reg_classes = num_classes``
    unless CLS_AGNOSTIC_BBOX_REG): deltas are (R, reg_classes * 4)."""

    num_classes: int
    with_reg: bool = False
    reg_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        logits = Linear(
            features=self.num_classes + 1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="refine_score",
        )(x).astype(jnp.float32)
        deltas = None
        if self.with_reg:
            deltas = Linear(
                features=4 * self.reg_classes,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.001),
                name="refine_reg",
            )(x).astype(jnp.float32)
        return logits, deltas


def _pgt_gather_boxes(boxes: Array, topi: Array) -> Array:
    """(R, 4) shared or (R, C, 4) per-class-regressed boxes -> (C, K, 4)
    mined boxes (reference get_pgt_top_k :1185-1199: with class-specific
    regression the mined box for class c is that class's regressed box)."""
    if boxes.ndim == 3:
        c = topi.shape[0]
        return boxes[topi, jnp.arange(c)[:, None], :]
    return boxes[topi]


def get_pgt_top_k(
    boxes: Array,  # (R, 4) or (R, C, 4) per-class regressed
    scores: Array,  # (R, C) source scores (MIL or previous branch fg slice)
    valid: Array,  # (R,)
    image_labels: Array,  # (C,) multi-hot
    top_k: int = 1,
    img_weights: Optional[Array] = None,  # (C,) pred_class_img_logits
) -> Dict[str, Array]:
    """Mine top-k scoring proposals per present image class
    (reference roi_heads_jtsm.py:1168). Returns fixed (C, top_k) pgt boxes,
    mined scores, supervision weights and validity.

    ``weight`` follows the reference's ``need_weight`` path (:1263): the
    image-level class logit ``pred_class_img_logits[c]`` when
    ``img_weights`` is given, else the mined proposal score (the MIST
    miner's behavior — its targets zip gt_weights=pgt_scores, :1074)."""
    masked = jnp.where(valid[:, None], scores, -jnp.inf)  # (R, C)
    topv, topi = jax.lax.top_k(masked.T, top_k)  # (C, K)
    pgt_valid = (image_labels[:, None] > 0) & jnp.isfinite(topv)
    pgt_boxes = _pgt_gather_boxes(boxes, topi)  # (C, K, 4)
    pgt_score = jnp.where(pgt_valid, topv, 0.0)
    if img_weights is None:
        pgt_weight = pgt_score
    else:
        pgt_weight = jnp.where(
            pgt_valid, jnp.broadcast_to(img_weights[:, None], topv.shape), 0.0
        )
    return {
        "boxes": pgt_boxes,
        "weight": pgt_weight,
        "score": pgt_score,
        "valid": pgt_valid,
        "classes": jnp.broadcast_to(
            jnp.arange(scores.shape[1])[:, None], topv.shape
        ),
        "idx": topi,
    }


def get_pgt_mist(
    boxes: Array,
    scores: Array,
    valid: Array,
    image_labels: Array,
    top_pct: float = 0.15,
    iou_thresh: float = 0.2,
    max_k: int = 32,
) -> Dict[str, Array]:
    """MIST mining (reference roi_heads_jtsm.py:1038): top 15% of proposals
    per present class, then ONE class-agnostic NMS at 0.2 across ALL mined
    candidates (the reference passes zeroed class idxs to batched_nms, so
    suppression crosses class boundaries). Static: cap at max_k per class."""
    r = boxes.shape[0]
    k = min(max_k, r)
    c = scores.shape[1]
    masked = jnp.where(valid[:, None], scores, -jnp.inf)
    topv, topi = jax.lax.top_k(masked.T, k)  # (C, k)
    num_take = jnp.maximum((jnp.sum(valid) * top_pct).astype(jnp.int32), 1)
    in_pct = jnp.arange(k)[None, :] < num_take

    cand_valid = (
        (image_labels[:, None] > 0) & in_pct & jnp.isfinite(topv)
    )  # (C, k)
    pgt_boxes = _pgt_gather_boxes(boxes, topi)
    flat_boxes = pgt_boxes.reshape(c * k, 4)
    flat_scores = jnp.where(cand_valid, topv, -jnp.inf).reshape(c * k)
    keep = nms_mask(flat_boxes, flat_scores, iou_thresh).reshape(c, k)

    pgt_valid = cand_valid & keep
    # the reference MIST targets carry gt_weights = pgt_SCORES
    # (roi_heads_jtsm.py:1074 zips pgt_scores into the weights slot), so
    # under MIST weight == mined score — unlike the top-k miner
    pgt_score = jnp.where(pgt_valid, topv, 0.0)
    return {
        "boxes": pgt_boxes,
        "weight": pgt_score,
        "score": pgt_score,
        "valid": pgt_valid,
        "classes": jnp.broadcast_to(jnp.arange(c)[:, None], topv.shape),
        "idx": topi,
    }


def label_proposals_by_pgt(
    boxes: Array,  # (R, 4)
    valid: Array,  # (R,)
    pgt: Dict[str, Array],
    num_classes: int,
    fg_thresh: float = 0.5,
    bg_thresh: Optional[float] = None,
    iou_thresholds: Optional[Sequence[float]] = None,
    iou_labels: Optional[Sequence[int]] = None,
) -> Dict[str, Array]:
    """Assign every proposal a (class, weight) from mined PGT by IoU
    (reference OICR supervision): IoU >= fg_thresh -> pgt class; else
    background with the matched pgt's weight.

    When ``iou_thresholds``/``iou_labels`` are given, use Matcher semantics
    instead (reference label_and_sample_proposals_wsl per-branch matchers,
    WSL.SAMPLING.*): ascending thresholds split IoU into len+1 intervals
    labeled by ``iou_labels`` with 1 = foreground, 0 = background,
    -1 = ignore (weight 0)."""
    c, k = pgt["valid"].shape
    pgt_boxes = pgt["boxes"].reshape(c * k, 4)
    pgt_w = pgt["weight"].reshape(c * k)
    pgt_cls = pgt["classes"].reshape(c * k)
    pgt_valid = pgt["valid"].reshape(c * k)

    iou = pairwise_iou(boxes, pgt_boxes)  # (R, CK)
    iou = jnp.where(pgt_valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)

    if iou_thresholds is not None:
        lab = jnp.asarray(list(iou_labels), jnp.int32)
        interval = sum(
            (best >= t).astype(jnp.int32) for t in iou_thresholds
        )  # 0..len(thresholds)
        match_label = lab[interval]
        fg = match_label == 1
        ignore = match_label == -1
    else:
        fg = best >= fg_thresh
        ignore = (
            (~fg) & (best >= bg_thresh)
            if bg_thresh is not None
            else jnp.zeros_like(fg)
        )
    labels = jnp.where(fg, pgt_cls[arg], num_classes)
    weights = jnp.where(valid, pgt_w[arg], 0.0)
    any_pgt = jnp.any(pgt_valid)
    weights = jnp.where(any_pgt, weights, 0.0)
    weights = jnp.where(ignore, 0.0, weights)
    return {
        "labels": labels,
        "weights": weights,
        "matched_pgt_boxes": pgt_boxes[arg],
        "fg": fg & valid,
    }


def oicr_branch_loss(
    logits: Array,  # (R, K+1)
    labels: Array,  # (R,)
    weights: Array,  # (R,)
) -> Array:
    """Weighted CE averaged over proposals (reference fast_rcnn_oicr.py:282)."""
    ce = softmax_cross_entropy(logits, labels)
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights > 0), 1.0)


def oicr_branch_loss_terms(
    logits: Array,  # (R, K+1)
    labels: Array,  # (R,)
    weights: Array,  # (R,)
) -> Tuple[Array, Array]:
    """Per-image (weighted CE sum, valid-weight count) for the reference's
    BATCH-level normalizer (fast_rcnn_oicr.py:247-297: OICROutputs gets the
    whole batch's proposals, so loss_cls = sum(ce * w) / count(w > 1e-12)
    over ALL images, not a per-image mean). Callers sum both terms over
    the batch and divide once."""
    ce = softmax_cross_entropy(logits, labels)
    return jnp.sum(ce * weights), jnp.sum((weights > 1e-12).astype(jnp.float32))


def oicr_reg_loss_sum(
    deltas: Array,  # (R, reg_classes * 4)
    labels: Array,  # (R,) supervision classes (bg = num_classes)
    weights: Array,  # (R,)
    fg: Array,  # (R,) bool foreground mask
    prop_boxes: Array,  # (R, 4)
    pgt_boxes: Array,  # (R, 4) matched pgt boxes
    box2box_transform,
    beta: float = 0.0,
) -> Array:
    """Per-image 'smooth_l1_weighted' regression sum (reference
    fast_rcnn_oicr.py:350-362): the fg proposal's class delta block vs the
    deltas to its matched pgt box, elementwise smooth-l1 times the proposal
    weight, summed. The caller divides by the batch proposal count
    (:378 ``loss_box_reg / self.gt_classes.numel()``)."""
    from ...ops.losses import smooth_l1_loss

    r = deltas.shape[0]
    t = box2box_transform.get_deltas(prop_boxes, pgt_boxes)
    if deltas.shape[-1] == 4:
        d = deltas
    else:
        nrc = deltas.shape[-1] // 4
        d = deltas.reshape(r, nrc, 4)[jnp.arange(r), jnp.clip(labels, 0, nrc - 1)]
    per = smooth_l1_loss(d, t, beta).sum(-1)
    return jnp.sum(per * weights * fg.astype(per.dtype))

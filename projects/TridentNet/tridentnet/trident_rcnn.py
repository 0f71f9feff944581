"""Trident RPN + ROI heads (reference: projects/TridentNet/tridentnet/
trident_rpn.py, trident_rcnn.py).

The trident backbone folds its N dilation branches into the batch dimension
(B*N images, branch-major). The reference's TridentRPN duplicates images/GT
num_branch times and TridentRes5ROIHeads duplicates targets at train and
merges branch detections at inference (trident_rcnn.py:8
``merge_branch_instances``: concat + class-aware NMS + topk). Here both are
thin subclasses using the `_adapt_inputs` / `_merge_detections` hooks — the
folded batch stays ONE jittable static-shape computation on TPU.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ShapeSpec
from jtsm_tpu.modeling.proposal_generator.rpn import (
    PROPOSAL_GENERATOR_REGISTRY,
    RPN,
)
from jtsm_tpu.modeling.roi_heads.res5_roi_heads import Res5ROIHeads
from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY
from jtsm_tpu.ops.nms import batched_nms_mask

Array = jax.Array


def _tile_branchwise(x, n: int):
    """[B, ...] -> [B*N, ...] matching branch-major concat order."""
    if x is None:
        return None
    return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))


def merge_branch_detections(
    detections: Dict[str, Array],
    orig_batch: int,
    nms_thresh: float,
    topk_per_image: int,
) -> Dict[str, Array]:
    """Merge (B*N, D, ...) branch detections into (B, topk, ...) via
    class-aware NMS (reference trident_rcnn.py:8 merge_branch_instances)."""
    bn, d = detections["boxes"].shape[:2]
    n = bn // orig_batch
    if n == 1:
        return detections

    def regroup(x):
        # (N*B, D, ...) branch-major -> (B, N*D, ...)
        x = x.reshape((n, orig_batch, d) + x.shape[2:])
        x = jnp.moveaxis(x, 1, 0)
        return x.reshape((orig_batch, n * d) + x.shape[3:])

    g = {k: regroup(v) for k, v in detections.items()}

    def merge_one(boxes, scores, classes, valid):
        s = jnp.where(valid, scores, -jnp.inf)
        keep = batched_nms_mask(boxes, s, classes, nms_thresh)
        s = jnp.where(keep, s, -jnp.inf)
        k = min(topk_per_image, s.shape[0])
        top_s, top_i = jax.lax.top_k(s, k)
        return top_i, jnp.isfinite(top_s)

    top_i, out_valid = jax.vmap(merge_one)(
        g["boxes"], g["scores"], g["classes"], g["valid"]
    )
    out = {
        k: jax.vmap(lambda v, i: v[i])(g[k], top_i)
        for k in g
        if k != "valid"
    }
    out["scores"] = jnp.where(out_valid, out["scores"], 0.0)
    out["valid"] = out_valid
    return out


@PROPOSAL_GENERATOR_REGISTRY.register()
class TridentRPN(RPN):
    """RPN over the branch-folded batch (reference trident_rpn.py:12)."""

    num_branch: int = 3

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = RPN.from_config(cfg, input_shape)
        ret["num_branch"] = cfg.MODEL.TRIDENT.NUM_BRANCH
        return ret

    def _adapt_inputs(self, feature_batch, image_sizes, gt_boxes, gt_valid):
        n = feature_batch // image_sizes.shape[0]
        if n <= 1:
            return image_sizes, gt_boxes, gt_valid
        return (
            _tile_branchwise(image_sizes, n),
            _tile_branchwise(gt_boxes, n),
            _tile_branchwise(gt_valid, n),
        )


@ROI_HEADS_REGISTRY.register()
class TridentRes5ROIHeads(Res5ROIHeads):
    """C4 heads over the folded batch; merges branches at inference
    (reference trident_rcnn.py:48)."""

    num_branch: int = 3

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = Res5ROIHeads.from_config(cfg, input_shape)
        ret["num_branch"] = cfg.MODEL.TRIDENT.NUM_BRANCH
        return ret

    def _adapt_inputs(self, batch, image_sizes, targets):
        n = batch // image_sizes.shape[0]
        if n <= 1:
            return image_sizes, targets
        image_sizes = _tile_branchwise(image_sizes, n)
        if targets is not None:
            targets = {k: _tile_branchwise(v, n) for k, v in targets.items()}
        return image_sizes, targets

    def _merge_detections(self, detections, orig_batch):
        return merge_branch_detections(
            detections,
            orig_batch,
            self.nms_thresh_test,
            self.detections_per_image,
        )

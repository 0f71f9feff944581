"""Second-stage orchestration (reference:
detectron2/modeling/roi_heads/roi_heads.py:123 ``ROIHeads`` base with
``label_and_sample_proposals``, :343 ``Res5ROIHeads``, :520
``StandardROIHeads``).

Static-shape TPU re-design:
* proposals are fixed (B, K, 4) with -inf-score padding;
* sampling returns exactly ``batch_size_per_image`` slots per image with a
  validity mask (padded when fewer are eligible);
* GT comes as padded (B, G, ...) arrays; GT masks as per-box crops (see
  mask_head.mask_targets_from_crops).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...ops.box_regression import Box2BoxTransform
from ...ops.matcher import Matcher
from ...ops.sampling import subsample_labels
from ...structures.boxes import pairwise_iou
from ...utils.registry import Registry
from ..poolers import ROIPooler
from .box_head import build_box_head
from .fast_rcnn import (
    FastRCNNOutputLayers,
    fast_rcnn_inference_single,
    fast_rcnn_losses,
)
from .mask_head import (
    build_mask_head,
    mask_rcnn_inference,
    mask_rcnn_loss,
    mask_targets_from_crops,
)
from .proposal_sampling import sample_proposals_single

ROI_HEADS_REGISTRY = Registry("ROI_HEADS")

Array = jax.Array


def build_roi_heads(cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
    name = cfg.MODEL.ROI_HEADS.NAME
    # A mask head may require a coupled ROI-heads implementation (e.g. the
    # reference's PointRendMaskHead runs point subdivision inside the head;
    # here that logic needs image-level features, so the head class declares
    # ROI_HEADS_OVERRIDE = "PointRendROIHeads" and reference yamls — which
    # leave ROI_HEADS.NAME at StandardROIHeads — build the right heads).
    if name == "StandardROIHeads" and cfg.MODEL.MASK_ON:
        try:
            from .mask_head import ROI_MASK_HEAD_REGISTRY

            mh_cls = ROI_MASK_HEAD_REGISTRY.get(cfg.MODEL.ROI_MASK_HEAD.NAME)
            name = getattr(mh_cls, "ROI_HEADS_OVERRIDE", name)
        except KeyError:
            pass
    cls_ = ROI_HEADS_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, input_shape))


@ROI_HEADS_REGISTRY.register()
class StandardROIHeads(nn.Module):
    """FPN-style heads with separate box/mask poolers (reference :520)."""

    num_classes: int
    box_in_features: Sequence[str]
    box_pooler: ROIPooler
    box_head: nn.Module
    box_predictor: nn.Module
    proposal_matcher: Matcher
    box2box_transform: Box2BoxTransform
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    proposal_append_gt: bool = True
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    train_on_pred_boxes: bool = False
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    # mask branch
    mask_on: bool = False
    mask_in_features: Optional[Sequence[str]] = None
    mask_pooler: Optional[ROIPooler] = None
    mask_head: Optional[nn.Module] = None
    mask_fg_capacity: int = 128
    mask_size: int = 28
    # keypoint branch
    keypoint_on: bool = False
    keypoint_pooler: Optional[ROIPooler] = None
    keypoint_head: Optional[nn.Module] = None
    normalize_loss_by_visible_keypoints: bool = True
    keypoint_loss_weight: float = 1.0
    # TPU.REMAT scopes: "box_head"/"mask_head"/"keypoint_head" recompute the
    # per-ROI head stack on the backward pass (the mask head's (B*Sm, 28, 28,
    # 256) conv activations are the largest single train buffers at scale)
    remat_scopes: Sequence[str] = ()

    def _head_call(self, scope: str, head, feats, train: bool):
        if train and scope in self.remat_scopes:
            return nn.remat(lambda mdl, f: mdl(f))(head, feats)
        return head(feats)

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        pooler_res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        pooler_scales = tuple(1.0 / input_shape[k].stride for k in in_features)
        box_pooler = ROIPooler(
            output_size=pooler_res,
            scales=pooler_scales,
            sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
        )
        in_channels = input_shape[in_features[0]].channels
        box_head = build_box_head(
            cfg, ShapeSpec(channels=in_channels, height=pooler_res, width=pooler_res)
        )
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        box_predictor = FastRCNNOutputLayers(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
            dtype=dtype,
        )
        ret = dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            box_in_features=in_features,
            box_pooler=box_pooler,
            box_head=box_head,
            box_predictor=box_predictor,
            proposal_matcher=Matcher(
                cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
                cfg.MODEL.ROI_HEADS.IOU_LABELS,
                allow_low_quality_matches=False,
            ),
            box2box_transform=Box2BoxTransform(
                weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
            ),
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            train_on_pred_boxes=cfg.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES,
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            mask_on=cfg.MODEL.MASK_ON,
            remat_scopes=tuple(cfg.TPU.REMAT),
        )
        if cfg.MODEL.MASK_ON:
            mask_res = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
            ret.update(
                mask_in_features=in_features,
                mask_pooler=ROIPooler(
                    output_size=mask_res,
                    scales=pooler_scales,
                    sampling_ratio=cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO,
                    pooler_type=cfg.MODEL.ROI_MASK_HEAD.POOLER_TYPE,
                ),
                mask_head=build_mask_head(
                    cfg,
                    ShapeSpec(channels=in_channels, height=mask_res, width=mask_res),
                ),
                mask_size=mask_res * 2,
            )
        if cfg.MODEL.KEYPOINT_ON:
            from .keypoint_head import build_keypoint_head

            kp_res = cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION
            ret.update(
                keypoint_on=True,
                keypoint_pooler=ROIPooler(
                    output_size=kp_res,
                    scales=pooler_scales,
                    sampling_ratio=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO,
                    pooler_type=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_TYPE,
                ),
                keypoint_head=build_keypoint_head(
                    cfg, ShapeSpec(channels=in_channels, height=kp_res, width=kp_res)
                ),
                normalize_loss_by_visible_keypoints=(
                    cfg.MODEL.ROI_KEYPOINT_HEAD.NORMALIZE_LOSS_BY_VISIBLE_KEYPOINTS
                ),
                keypoint_loss_weight=cfg.MODEL.ROI_KEYPOINT_HEAD.LOSS_WEIGHT,
            )
        return ret

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,  # (B, K, 4)
        proposal_scores: Array,  # (B, K)
        image_sizes: Array,  # (B, 2)
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
    ):
        feats = [features[f] for f in self.box_in_features]
        b = proposals.shape[0]

        if train:
            assert targets is not None
            rng = self.make_rng("sampling")
            rngs = jax.random.split(rng, b)
            sampled = jax.vmap(
                lambda r, p, ps, gb, gc, gv: sample_proposals_single(
                    r,
                    p,
                    ps,
                    gb,
                    gc,
                    gv,
                    num_classes=self.num_classes,
                    batch_size_per_image=self.batch_size_per_image,
                    positive_fraction=self.positive_fraction,
                    matcher=self.proposal_matcher,
                    append_gt=self.proposal_append_gt,
                )
            )(
                rngs,
                proposals,
                proposal_scores,
                targets["gt_boxes"],
                targets["gt_classes"],
                targets["gt_valid"],
            )
            s = self.batch_size_per_image
            flat_boxes = sampled["boxes"].reshape(b * s, 4)
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s)

            box_feats = self.box_pooler(feats, flat_boxes, batch_idx, rois_per_image=s)
            box_feats = self._head_call("box_head", self.box_head, box_feats, True)
            scores, deltas = self.box_predictor(box_feats)

            losses = fast_rcnn_losses(
                scores,
                deltas,
                flat_boxes,
                sampled["gt_classes"].reshape(-1),
                sampled["gt_boxes"].reshape(-1, 4),
                sampled["valid"].reshape(-1),
                self.box2box_transform,
                self.num_classes,
                self.smooth_l1_beta,
                self.box_reg_loss_type,
            )

            if self.train_on_pred_boxes:
                # reference fast_rcnn.py predict_boxes_for_gt_classes: the
                # downstream heads train on the box head's refined boxes
                # (gradients cut — they are "data", like proposals)
                d = jax.lax.stop_gradient(deltas).reshape(b * s, -1, 4)
                cls = jnp.clip(sampled["gt_classes"].reshape(-1), 0, d.shape[1] - 1)
                sel = jnp.take_along_axis(d, cls[:, None, None], axis=1)[:, 0]
                pred = self.box2box_transform.apply_deltas(sel, flat_boxes)
                sampled = dict(sampled, boxes=pred.reshape(b, s, 4))

            if self.mask_on:
                losses.update(
                    self._forward_mask_train(feats, sampled, targets, b)
                )
            if self.keypoint_on and "gt_keypoints" in targets:
                losses.update(
                    self._forward_keypoint_train(features, sampled, targets, b)
                )
            losses.update(self._forward_extra_train(features, sampled, targets, b))
            return {}, losses
        else:
            k = proposals.shape[1]
            flat_boxes = proposals.reshape(b * k, 4)
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
            box_feats = self.box_pooler(feats, flat_boxes, batch_idx, rois_per_image=k)
            box_feats = self.box_head(box_feats)
            scores, deltas = self.box_predictor(box_feats)

            scores = scores.reshape(b, k, -1)
            deltas = deltas.reshape(b, k, -1)
            prop_valid = jnp.isfinite(proposal_scores)

            detections = jax.vmap(
                lambda sc, dl, pb, pv, sz: fast_rcnn_inference_single(
                    sc,
                    dl,
                    pb,
                    pv,
                    sz,
                    self.box2box_transform,
                    self.num_classes,
                    self.score_thresh_test,
                    self.nms_thresh_test,
                    self.detections_per_image,
                )
            )(scores, deltas, proposals, prop_valid, image_sizes)

            if self.mask_on:
                detections = self._forward_mask_inference(features, detections, b)
            if self.keypoint_on:
                from .keypoint_head import keypoint_rcnn_inference

                d = detections["boxes"].shape[1]
                det_boxes = detections["boxes"].reshape(b * d, 4)
                det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
                kfeats = [features[f] for f in self.box_in_features]
                kp_feats = self.keypoint_pooler(kfeats, det_boxes, det_batch, rois_per_image=d)
                kp_logits = self.keypoint_head(kp_feats)
                kps = keypoint_rcnn_inference(kp_logits, det_boxes)
                detections["keypoints"] = kps.reshape(b, d, -1, 4)
            detections = self._forward_extra_inference(features, detections, b)
            return detections, {}

    def forward_with_given_boxes(self, features, detections):
        """Run only the per-box branches (mask/keypoint/extras) on provided
        detections (reference roi_heads.py ``forward_with_given_boxes``,
        used by the TTA mask re-run on merged boxes)."""
        b = detections["boxes"].shape[0]
        if self.mask_on:
            detections = self._forward_mask_inference(features, detections, b)
        if self.keypoint_on:
            from .keypoint_head import keypoint_rcnn_inference

            d = detections["boxes"].shape[1]
            det_boxes = detections["boxes"].reshape(b * d, 4)
            det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
            kfeats = [features[f] for f in self.box_in_features]
            kp_feats = self.keypoint_pooler(kfeats, det_boxes, det_batch, rois_per_image=d)
            kp_logits = self.keypoint_head(kp_feats)
            kps = keypoint_rcnn_inference(kp_logits, det_boxes)
            detections["keypoints"] = kps.reshape(b, d, -1, 4)
        return self._forward_extra_inference(features, detections, b)

    def _forward_extra_train(self, features, sampled, targets, b):
        """Hook for subclass branches (e.g. DensePose) on the sampled rois."""
        return {}

    def _forward_extra_inference(self, features, detections, b):
        """Hook for subclass branches on the final detections."""
        return detections

    def _forward_mask_train(self, feats, sampled, targets, b):
        """Pick up to mask_fg_capacity fg rois per image, pool 14x14, BCE."""
        s = self.batch_size_per_image
        sm = min(self.mask_fg_capacity, s)
        fg = sampled["fg"]  # (B, S)

        rng = self.make_rng("sampling")

        def pick(rng_i, fg_i):
            u = jax.random.uniform(rng_i, (s,))
            pri = jnp.where(fg_i, 1.0 + u, -jnp.inf)
            v, idx = jax.lax.top_k(pri, sm)
            return idx, jnp.isfinite(v)

        rngs = jax.random.split(rng, b)
        mask_idx, mask_valid = jax.vmap(pick)(rngs, fg)  # (B, Sm)

        mask_boxes = jnp.take_along_axis(sampled["boxes"], mask_idx[..., None], axis=1)
        mask_classes = jnp.take_along_axis(sampled["gt_classes"], mask_idx, axis=1)
        matched = jnp.take_along_axis(sampled["matched_idx"], mask_idx, axis=1)

        targets_masks = jax.vmap(
            lambda crops, gtb, mi, pb: mask_targets_from_crops(
                crops, gtb, mi, pb, self.mask_size
            )
        )(
            targets["gt_mask_crops"],
            targets["gt_boxes"],
            matched,
            mask_boxes,
        )  # (B, Sm, S, S)

        flat_boxes = mask_boxes.reshape(b * sm, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), sm)
        mask_feats = self.mask_pooler(feats, flat_boxes, batch_idx, rois_per_image=sm)
        mask_logits = self._head_call("mask_head", self.mask_head, mask_feats, True)

        loss = mask_rcnn_loss(
            mask_logits,
            mask_classes.reshape(-1),
            targets_masks.reshape(-1, self.mask_size, self.mask_size),
            mask_valid.reshape(-1),
        )
        return {"loss_mask": loss}

    def _forward_mask_inference(self, features, detections, b):
        d = detections["boxes"].shape[1]
        det_boxes = detections["boxes"].reshape(b * d, 4)
        det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        mfeats = [features[f] for f in self.mask_in_features]
        mask_feats = self.mask_pooler(mfeats, det_boxes, det_batch, rois_per_image=d)
        mask_logits = self.mask_head(mask_feats)
        probs = mask_rcnn_inference(mask_logits, detections["classes"].reshape(-1))
        detections["masks"] = probs.reshape(b, d, probs.shape[-2], probs.shape[-1])
        return detections

    def _forward_keypoint_train(self, features, sampled, targets, b):
        """fg rois -> heatmap CE (reference roi_heads.py _forward_keypoint)."""
        from .keypoint_head import keypoint_rcnn_loss

        s = self.batch_size_per_image
        sm = min(self.mask_fg_capacity, s)
        fg = sampled["fg"]
        rng = self.make_rng("sampling")

        def pick(rng_i, fg_i):
            u = jax.random.uniform(rng_i, (s,))
            pri = jnp.where(fg_i, 1.0 + u, -jnp.inf)
            v, idx = jax.lax.top_k(pri, sm)
            return idx, jnp.isfinite(v)

        rngs = jax.random.split(rng, b)
        kp_idx, kp_valid = jax.vmap(pick)(rngs, fg)
        kp_boxes = jnp.take_along_axis(sampled["boxes"], kp_idx[..., None], axis=1)
        matched = jnp.take_along_axis(sampled["matched_idx"], kp_idx, axis=1)
        gt_kpts = jnp.take_along_axis(
            targets["gt_keypoints"], matched[..., None, None], axis=1
        )  # (B, Sm, K, 3)

        flat_boxes = kp_boxes.reshape(b * sm, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), sm)
        kfeats = [features[f] for f in self.box_in_features]
        kp_feats = self.keypoint_pooler(kfeats, flat_boxes, batch_idx, rois_per_image=sm)
        kp_logits = self._head_call("keypoint_head", self.keypoint_head, kp_feats, True)
        loss = keypoint_rcnn_loss(
            kp_logits,
            gt_kpts.reshape(b * sm, -1, 3),
            flat_boxes,
            kp_valid.reshape(-1),
            self.normalize_loss_by_visible_keypoints,
        )
        return {"loss_keypoint": loss * self.keypoint_loss_weight}


def select_foreground_proposals(proposals, bg_label: int):
    """Static-shape analog of reference roi_heads.py:46: instead of filtering
    to a dynamic-length foreground list, return the (unchanged) padded
    proposals plus a boolean foreground mask over the proposal axis
    (``gt_classes != -1 and != bg_label``). Heads gate their losses on it."""
    gt = proposals["gt_classes"]
    fg = (gt >= 0) & (gt != bg_label)
    return proposals, fg


# reference roi_heads.py:123 ``ROIHeads`` — the subclassing/registry base.
# Here StandardROIHeads carries the shared label-and-sample machinery that the
# reference keeps in the base class, so the reference name points at it.
ROIHeads = StandardROIHeads

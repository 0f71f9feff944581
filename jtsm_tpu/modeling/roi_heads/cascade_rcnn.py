"""Cascade R-CNN heads (reference:
detectron2/modeling/roi_heads/cascade_rcnn.py — 3 stages with increasing IoU
thresholds; each stage re-matches the previous stage's regressed boxes)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...ops.box_regression import Box2BoxTransform
from ...ops.matcher import Matcher
from ...structures.boxes import clip_boxes
from ..poolers import ROIPooler
from .box_head import build_box_head
from .fast_rcnn import (
    FastRCNNOutputLayers,
    fast_rcnn_inference_single,
    fast_rcnn_losses,
)
from .proposal_sampling import sample_proposals_single
from .roi_heads import ROI_HEADS_REGISTRY, StandardROIHeads

Array = jax.Array


@ROI_HEADS_REGISTRY.register()
class CascadeROIHeads(StandardROIHeads):
    """Multi-stage box refinement. Fields beyond StandardROIHeads: per-stage
    matchers/transforms built from ROI_BOX_CASCADE_HEAD."""

    cascade_ious: Sequence[float] = (0.5, 0.6, 0.7)
    cascade_bbox_reg_weights: Sequence[Tuple[float, ...]] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = StandardROIHeads.from_config(cfg, input_shape)
        ret["cascade_ious"] = tuple(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS)
        ret["cascade_bbox_reg_weights"] = tuple(
            tuple(w) for w in cfg.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS
        )
        assert not cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG is False or True
        return ret

    @property
    def num_stages(self) -> int:
        return len(self.cascade_ious)

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,
        proposal_scores: Array,
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
    ):
        feats = [features[f] for f in self.box_in_features]
        b = proposals.shape[0]

        # per-stage heads (separate params; class-agnostic regression like
        # the reference)
        heads = []
        for s in range(self.num_stages):
            head = build_box_head_like(self, s)
            predictor = FastRCNNOutputLayers(
                num_classes=self.num_classes,
                cls_agnostic_bbox_reg=True,
                dtype=self.box_predictor.dtype,
                name=f"box_predictor_stage{s}",
            )
            heads.append((head, predictor))

        transforms = [
            Box2BoxTransform(weights=w) for w in self.cascade_bbox_reg_weights
        ]
        matchers = [
            Matcher([iou], [0, 1], allow_low_quality_matches=False)
            for iou in self.cascade_ious
        ]

        if train:
            assert targets is not None
            rng = self.make_rng("sampling")
            losses = {}
            boxes = proposals
            scores_cur = proposal_scores
            all_logits = []
            for s in range(self.num_stages):
                rng, sub = jax.random.split(rng)
                rngs = jax.random.split(sub, b)
                sampled = jax.vmap(
                    lambda r_, p_, ps_, gb, gc, gv, s=s: sample_proposals_single(
                        r_,
                        p_,
                        ps_,
                        gb,
                        gc,
                        gv,
                        num_classes=self.num_classes,
                        batch_size_per_image=self.batch_size_per_image,
                        positive_fraction=self.positive_fraction,
                        matcher=matchers[s],
                        append_gt=self.proposal_append_gt and s == 0,
                    )
                )(
                    rngs,
                    boxes,
                    scores_cur,
                    targets["gt_boxes"],
                    targets["gt_classes"],
                    targets["gt_valid"],
                )
                sN = self.batch_size_per_image
                flat_boxes = sampled["boxes"].reshape(b * sN, 4)
                batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), sN)
                x = self.box_pooler(feats, flat_boxes, batch_idx, rois_per_image=sN)
                x = heads[s][0](x)
                logits, deltas = heads[s][1](x)
                stage_losses = fast_rcnn_losses(
                    logits,
                    deltas,
                    flat_boxes,
                    sampled["gt_classes"].reshape(-1),
                    sampled["gt_boxes"].reshape(-1, 4),
                    sampled["valid"].reshape(-1),
                    transforms[s],
                    self.num_classes,
                    self.smooth_l1_beta,
                    self.box_reg_loss_type,
                )
                losses.update({f"{k}_stage{s}": v for k, v in stage_losses.items()})
                # next-stage boxes: regressed sampled boxes (stop-gradient)
                dec = transforms[s].apply_deltas(
                    jax.lax.stop_gradient(deltas), flat_boxes
                ).reshape(b, sN, 4)
                dec = jax.vmap(clip_boxes)(dec, image_sizes)
                boxes = dec
                scores_cur = jnp.where(sampled["valid"], 0.0, -jnp.inf)

            if self.mask_on:
                losses.update(self._forward_mask_train(feats, sampled, targets, b))
            return {}, losses

        # inference: run the cascade forward, average stage class scores
        k = proposals.shape[1]
        boxes = proposals
        prop_valid = jnp.isfinite(proposal_scores)
        stage_probs = []
        deltas = None
        for s in range(self.num_stages):
            flat_boxes = boxes.reshape(b * k, 4)
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
            x = self.box_pooler(feats, flat_boxes, batch_idx, rois_per_image=k)
            x = heads[s][0](x)
            logits, deltas = heads[s][1](x)
            stage_probs.append(jax.nn.softmax(logits.reshape(b, k, -1), axis=-1))
            dec = transforms[s].apply_deltas(deltas, flat_boxes).reshape(b, k, 4)
            boxes = jax.vmap(clip_boxes)(dec, image_sizes)

        mean_probs = sum(stage_probs) / self.num_stages  # (B, K, C+1)
        # feed fast_rcnn_inference with log-probs (it softmaxes internally)
        pseudo_logits = jnp.log(jnp.clip(mean_probs, 1e-8))
        detections = jax.vmap(
            lambda sc, dl, pb, pv, sz: fast_rcnn_inference_single(
                sc,
                dl,
                pb,
                pv,
                sz,
                transforms[-1],
                self.num_classes,
                self.score_thresh_test,
                self.nms_thresh_test,
                self.detections_per_image,
            )
        )(
            pseudo_logits,
            jnp.zeros((b, k, 4)),
            boxes,
            prop_valid,
            image_sizes,
        )

        if self.mask_on:
            from .mask_head import mask_rcnn_inference

            d = detections["boxes"].shape[1]
            det_boxes = detections["boxes"].reshape(b * d, 4)
            det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
            mfeats = [features[f] for f in self.mask_in_features]
            mask_feats = self.mask_pooler(mfeats, det_boxes, det_batch, rois_per_image=d)
            mask_logits = self.mask_head(mask_feats)
            probs = mask_rcnn_inference(mask_logits, detections["classes"].reshape(-1))
            detections["masks"] = probs.reshape(b, d, probs.shape[-2], probs.shape[-1])
        return detections, {}


def build_box_head_like(heads: CascadeROIHeads, stage: int):
    """Clone the configured box head with a per-stage name."""
    bh = heads.box_head
    return type(bh)(
        **{
            **{f.name: getattr(bh, f.name) for f in bh.__dataclass_fields__.values()
               if f.name not in ("name", "parent")},
            "name": f"box_head_stage{stage}",
        }
    )

"""Res5ROIHeads — the C4 second stage (reference:
detectron2/modeling/roi_heads/roi_heads.py:343): pool 14x14 from res4, run
the res5 stage inside the head, mean-pool for the box predictor; the C4 mask
head reuses the shared res5 features."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...ops.box_regression import Box2BoxTransform
from ...ops.matcher import Matcher
from ..backbone.resnet import BottleneckBlock
from ..poolers import ROIPooler
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
from .roi_heads import ROI_HEADS_REGISTRY

Array = jax.Array


@ROI_HEADS_REGISTRY.register()
class Res5ROIHeads(nn.Module):
    num_classes: int
    in_features: Sequence[str]
    pooler: ROIPooler
    box_predictor: nn.Module
    proposal_matcher: Matcher
    box2box_transform: Box2BoxTransform
    res5_out_channels: int = 2048
    res5_in_channels: int = 1024
    num_blocks: int = 3
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    norm: str = "FrozenBN"
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    proposal_append_gt: bool = True
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    mask_on: bool = False
    mask_head: Optional[nn.Module] = None
    mask_fg_capacity: int = 128
    mask_size: int = 14
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        assert len(in_features) == 1, in_features
        pooler_res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        pooler = ROIPooler(
            output_size=pooler_res,
            scales=(1.0 / input_shape[in_features[0]].stride,),
            sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
        )
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        bottleneck_channels = cfg.MODEL.RESNETS.NUM_GROUPS * cfg.MODEL.RESNETS.WIDTH_PER_GROUP * 8
        res5_out = cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * 8
        ret = dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            in_features=in_features,
            pooler=pooler,
            box_predictor=FastRCNNOutputLayers(
                num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
                cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
                dtype=dtype,
            ),
            proposal_matcher=Matcher(
                cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
                cfg.MODEL.ROI_HEADS.IOU_LABELS,
                allow_low_quality_matches=False,
            ),
            box2box_transform=Box2BoxTransform(
                weights=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS
            ),
            res5_out_channels=res5_out,
            res5_in_channels=input_shape[in_features[0]].channels,
            num_blocks=3,
            num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
            width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            norm=cfg.MODEL.RESNETS.NORM,
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            proposal_append_gt=cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT,
            smooth_l1_beta=cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            box_reg_loss_type=cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE,
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            mask_on=cfg.MODEL.MASK_ON,
            dtype=dtype,
        )
        if cfg.MODEL.MASK_ON:
            ret["mask_head"] = build_mask_head(
                cfg,
                ShapeSpec(channels=res5_out, height=pooler_res // 2, width=pooler_res // 2),
            )
            ret["mask_size"] = cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION
        return ret

    def setup(self):
        bottleneck_channels = self.num_groups * self.width_per_group * 8
        blocks = []
        in_c = self.res5_in_channels
        for b in range(self.num_blocks):
            blocks.append(
                BottleneckBlock(
                    in_channels=in_c,
                    out_channels=self.res5_out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=2 if b == 0 else 1,
                    num_groups=self.num_groups,
                    norm=self.norm,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"res5_block{b}",
                )
            )
            in_c = self.res5_out_channels
        self.res5 = blocks

    def _run_res5(self, x: Array) -> Array:
        for block in self.res5:
            x = block(x)
        return x

    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,
        proposal_scores: Array,
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        b = proposals.shape[0]
        # subclass hooks: TridentRes5ROIHeads tiles sizes/targets over the
        # branch-folded batch and merges branch detections at inference
        orig_b = image_sizes.shape[0]
        image_sizes, targets = self._adapt_inputs(b, image_sizes, targets)

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

            pooled = self.pooler(feats, flat_boxes, batch_idx, rois_per_image=s)
            res5_feat = self._run_res5(pooled)  # (B*S, 7, 7, 2048)
            box_feat = res5_feat.mean(axis=(1, 2))
            scores, deltas = self.box_predictor(box_feat)

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

            if self.mask_on:
                # C4 mask head reuses the shared res5 features of fg rois
                sm = min(self.mask_fg_capacity, s)
                fg = sampled["fg"]
                rng2 = self.make_rng("sampling")

                def pick(rng_i, fg_i):
                    u = jax.random.uniform(rng_i, (s,))
                    pri = jnp.where(fg_i, 1.0 + u, -jnp.inf)
                    v, idx = jax.lax.top_k(pri, sm)
                    return idx, jnp.isfinite(v)

                rngs2 = jax.random.split(rng2, b)
                mask_idx, mask_valid = jax.vmap(pick)(rngs2, fg)
                flat_mask_idx = (
                    mask_idx + jnp.arange(b, dtype=jnp.int32)[:, None] * s
                ).reshape(-1)
                mask_feats = res5_feat[flat_mask_idx]
                mask_logits = self.mask_head(mask_feats)

                mask_boxes = jnp.take_along_axis(
                    sampled["boxes"], mask_idx[..., None], axis=1
                )
                mask_classes = jnp.take_along_axis(sampled["gt_classes"], mask_idx, axis=1)
                matched = jnp.take_along_axis(sampled["matched_idx"], mask_idx, axis=1)
                mask_sz = mask_logits.shape[1]
                targets_masks = jax.vmap(
                    lambda crops, gtb, mi, pb: mask_targets_from_crops(
                        crops, gtb, mi, pb, mask_sz
                    )
                )(targets["gt_mask_crops"], targets["gt_boxes"], matched, mask_boxes)
                losses["loss_mask"] = mask_rcnn_loss(
                    mask_logits,
                    mask_classes.reshape(-1),
                    targets_masks.reshape(-1, mask_sz, mask_sz),
                    mask_valid.reshape(-1),
                )
            return {}, losses

        # inference
        k = proposals.shape[1]
        flat_boxes = proposals.reshape(b * k, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        pooled = self.pooler(feats, flat_boxes, batch_idx, rois_per_image=k)
        res5_feat = self._run_res5(pooled)
        box_feat = res5_feat.mean(axis=(1, 2))
        scores, deltas = self.box_predictor(box_feat)

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
            d = detections["boxes"].shape[1]
            det_boxes = detections["boxes"].reshape(b * d, 4)
            det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
            pooled_m = self.pooler(feats, det_boxes, det_batch, rois_per_image=d)
            res5_m = self._run_res5(pooled_m)
            mask_logits = self.mask_head(res5_m)
            probs = mask_rcnn_inference(mask_logits, detections["classes"].reshape(-1))
            detections["masks"] = probs.reshape(b, d, probs.shape[-2], probs.shape[-1])
        return self._merge_detections(detections, orig_b), {}

    def _adapt_inputs(self, batch, image_sizes, targets):
        return image_sizes, targets

    def _merge_detections(self, detections, orig_batch):
        return detections

"""Rotated Fast R-CNN heads (reference:
detectron2/modeling/roi_heads/rotated_fast_rcnn.py — RROIHeads with rotated
pooling, 5-param regression and rotated NMS inference)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Linear, ShapeSpec
from ...ops.box_regression import Box2BoxTransformRotated
from ...ops.matcher import Matcher
from ...ops.nms import batched_nms_rotated_mask
from ...ops.roi_align_rotated import roi_align_rotated_batched
from ...ops.losses import smooth_l1_loss, softmax_cross_entropy
from ...ops.sampling import subsample_labels
from ...structures.rotated_boxes import pairwise_iou_rotated
from .box_head import build_box_head
from .roi_heads import ROI_HEADS_REGISTRY

Array = jax.Array


@ROI_HEADS_REGISTRY.register()
class RROIHeads(nn.Module):
    num_classes: int
    in_features: Sequence[str]
    pooler_resolution: int = 7
    pooler_scale: float = 1.0 / 16
    sampling_ratio: int = 2
    box_head: Optional[nn.Module] = None
    proposal_matcher: Optional[Matcher] = None
    box2box_transform: Optional[Box2BoxTransformRotated] = None
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        assert len(in_features) == 1, "RROIHeads supports a single level"
        res = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            in_features=in_features,
            pooler_resolution=res,
            pooler_scale=1.0 / input_shape[in_features[0]].stride,
            sampling_ratio=max(cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO, 1)
            if cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO > 0
            else 2,
            box_head=build_box_head(
                cfg,
                ShapeSpec(
                    channels=input_shape[in_features[0]].channels, height=res, width=res
                ),
            ),
            proposal_matcher=Matcher(
                cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
                cfg.MODEL.ROI_HEADS.IOU_LABELS,
                allow_low_quality_matches=False,
            ),
            box2box_transform=Box2BoxTransformRotated(
                weights=(10.0, 10.0, 5.0, 5.0, 1.0)
            ),
            batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            score_thresh_test=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            nms_thresh_test=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            dtype=dtype,
        )

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        proposals: Array,  # (B, K, 5)
        proposal_scores: Array,  # (B, K)
        image_sizes: Array,
        targets: Optional[Dict[str, Array]] = None,  # gt_boxes (B, G, 5)
        train: bool = False,
    ):
        feat = features[self.in_features[0]]
        b, k = proposals.shape[:2]
        predictor_cls = Linear(
            features=self.num_classes + 1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )
        predictor_reg = Linear(
            features=5,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )

        if train:
            assert targets is not None
            rng = self.make_rng("sampling")
            rngs = jax.random.split(rng, b)

            def sample(rng_i, props, pscores, gt_b, gt_c, gt_v):
                valid = jnp.isfinite(pscores)
                iou = pairwise_iou_rotated(gt_b, props)
                iou = jnp.where(valid[None, :], iou, -1.0)
                matched_idx, matched_labels = self.proposal_matcher(iou, gt_valid=gt_v)
                cls = jnp.where(
                    matched_labels == 1, gt_c[matched_idx], self.num_classes
                ).astype(jnp.int32)
                lbl = jnp.where(
                    ~valid, -1, jnp.where(matched_labels == 1, 1, 0)
                ).astype(jnp.int32)
                r1, r2 = jax.random.split(rng_i)
                pos, neg = subsample_labels(
                    r1, lbl, self.batch_size_per_image, self.positive_fraction, 0
                )
                u = jax.random.uniform(r2, (props.shape[0],))
                pri = jnp.where(pos, 2.0 + u, jnp.where(neg, 1.0 + u, -jnp.inf))
                v, idx = jax.lax.top_k(pri, self.batch_size_per_image)
                ok = jnp.isfinite(v)
                return (
                    props[idx],
                    jnp.where(ok, cls[idx], self.num_classes),
                    gt_b[matched_idx[idx]],
                    ok,
                )

            sp, sc, sgt, ok = jax.vmap(sample)(
                rngs,
                proposals,
                proposal_scores,
                targets["gt_boxes"],
                targets["gt_classes"],
                targets["gt_valid"],
            )
            s = self.batch_size_per_image
            flat = sp.reshape(b * s, 5)
            bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s)
            pooled = roi_align_rotated_batched(
                feat, flat, bidx, self.pooler_resolution, self.pooler_scale, self.sampling_ratio
            )
            x = self.box_head(pooled)
            scores = predictor_cls(x).astype(jnp.float32)
            deltas = predictor_reg(x).astype(jnp.float32)

            okf = ok.reshape(-1).astype(jnp.float32)
            norm = jnp.maximum(okf.sum(), 1.0)
            ce = softmax_cross_entropy(scores, sc.reshape(-1))
            loss_cls = jnp.sum(ce * okf) / norm
            fg = ok.reshape(-1) & (sc.reshape(-1) < self.num_classes)
            tgt = self.box2box_transform.get_deltas(flat, sgt.reshape(-1, 5))
            reg = smooth_l1_loss(deltas, tgt, 0.0).sum(-1)
            loss_reg = jnp.sum(reg * fg) / norm
            return {}, {"loss_cls": loss_cls, "loss_box_reg": loss_reg}

        flat = proposals.reshape(b * k, 5)
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        pooled = roi_align_rotated_batched(
            feat, flat, bidx, self.pooler_resolution, self.pooler_scale, self.sampling_ratio
        )
        x = self.box_head(pooled)
        scores = predictor_cls(x).astype(jnp.float32).reshape(b, k, -1)
        deltas = predictor_reg(x).astype(jnp.float32).reshape(b, k, 5)
        valid = jnp.isfinite(proposal_scores)

        def infer(sc, dl, pb, v):
            probs = jax.nn.softmax(sc, -1)[:, : self.num_classes]
            boxes = self.box2box_transform.apply_deltas(dl, pb)
            flat_s = jnp.where(
                (probs > self.score_thresh_test) & v[:, None], probs, -jnp.inf
            ).reshape(-1)
            cls_ids = jnp.tile(jnp.arange(self.num_classes, dtype=jnp.int32), (k,))
            box_rep = jnp.repeat(boxes, self.num_classes, axis=0)
            c = min(512, flat_s.shape[0])
            topv, topi = jax.lax.top_k(flat_s, c)
            bb = box_rep[topi]
            cc = cls_ids[topi]
            keep = batched_nms_rotated_mask(bb, topv, cc, self.nms_thresh_test)
            final = jnp.where(keep, topv, -jnp.inf)
            d = min(self.detections_per_image, c)
            outv, oi = jax.lax.top_k(final, d)
            okd = jnp.isfinite(outv)
            res = {
                "boxes": bb[oi],
                "scores": jnp.where(okd, outv, 0.0),
                "classes": cc[oi],
                "valid": okd,
            }
            if self.detections_per_image > d:
                pad = self.detections_per_image - d
                res = {
                    "boxes": jnp.concatenate([res["boxes"], jnp.zeros((pad, 5))]),
                    "scores": jnp.concatenate([res["scores"], jnp.zeros((pad,))]),
                    "classes": jnp.concatenate([res["classes"], jnp.zeros((pad,), jnp.int32)]),
                    "valid": jnp.concatenate([res["valid"], jnp.zeros((pad,), bool)]),
                }
            return res

        detections = jax.vmap(infer)(scores, deltas, proposals, valid)
        return detections, {}

"""Rotated RPN (reference: detectron2/modeling/proposal_generator/rrpn.py):
5-param anchors/deltas, rotated IoU matching, rotated NMS."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...ops.box_regression import Box2BoxTransformRotated
from ...ops.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from ...ops.matcher import Matcher
from ...ops.nms import nms_rotated_mask
from ...ops.sampling import subsample_labels
from ...structures.rotated_boxes import pairwise_iou_rotated
from ..anchor_generator import build_anchor_generator
from .rpn import PROPOSAL_GENERATOR_REGISTRY, RPN_HEAD_REGISTRY

Array = jax.Array


@PROPOSAL_GENERATOR_REGISTRY.register()
class RRPN(nn.Module):
    in_features: Sequence[str]
    head: nn.Module
    anchor_generator: Any
    anchor_matcher: Matcher
    box2box_transform: Box2BoxTransformRotated
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 1000
    post_nms_topk_train: int = 1000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    loss_weight: float = 1.0
    smooth_l1_beta: float = 0.0

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.RPN.IN_FEATURES)
        shapes = [input_shape[f] for f in in_features]
        sub = cfg.clone()
        sub.defrost()
        sub.MODEL.ANCHOR_GENERATOR.NAME = "RotatedAnchorGenerator"
        anchor_generator = build_anchor_generator(sub, shapes)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        head = RPN_HEAD_REGISTRY.get(cfg.MODEL.RPN.HEAD_NAME)(
            in_channels=shapes[0].channels,
            num_anchors=anchor_generator.num_anchors[0],
            box_dim=5,
            dtype=dtype,
        )
        return dict(
            in_features=in_features,
            head=head,
            anchor_generator=anchor_generator,
            anchor_matcher=Matcher(
                cfg.MODEL.RPN.IOU_THRESHOLDS,
                cfg.MODEL.RPN.IOU_LABELS,
                allow_low_quality_matches=True,
            ),
            box2box_transform=Box2BoxTransformRotated(
                weights=(1.0, 1.0, 1.0, 1.0, 1.0)
            ),
            batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
        )

    @nn.compact
    def __call__(
        self,
        image_sizes: Array,
        features: Dict[str, Array],
        gt_boxes: Optional[Array] = None,  # (B, G, 5) rotated
        gt_valid: Optional[Array] = None,
        train: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        logits_lvl, deltas_lvl = self.head(feats)
        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(grid_sizes)

        b = feats[0].shape[0]
        logits_flat = jnp.concatenate(
            [l.astype(jnp.float32).reshape(b, -1) for l in logits_lvl], axis=1
        )
        deltas_flat = jnp.concatenate(
            [d.astype(jnp.float32).reshape(b, -1, 5) for d in deltas_lvl], axis=1
        )
        anchors_all = jnp.concatenate(anchors, axis=0)

        losses = {}
        if train:
            rng = self.make_rng("sampling")
            rngs = jax.random.split(rng, b)

            def one(rng_i, logit, delta, gt_b, gt_v):
                iou = pairwise_iou_rotated(gt_b, anchors_all)
                matched_idx, match_labels = self.anchor_matcher(iou, gt_valid=gt_v)
                pos, neg = subsample_labels(
                    rng_i,
                    match_labels.astype(jnp.int32),
                    self.batch_size_per_image,
                    self.positive_fraction,
                    bg_label=0,
                )
                sampled = pos | neg
                obj_loss = jnp.sum(
                    binary_cross_entropy_with_logits(logit, pos.astype(jnp.float32))
                    * sampled
                )
                target = self.box2box_transform.get_deltas(
                    anchors_all, gt_b[matched_idx]
                )
                reg = smooth_l1_loss(delta, target, self.smooth_l1_beta).sum(-1)
                return obj_loss, jnp.sum(reg * pos)

            obj, reg = jax.vmap(one)(rngs, logits_flat, deltas_flat, gt_boxes, gt_valid)
            norm = self.batch_size_per_image * b
            losses = {
                "loss_rpn_cls": jnp.sum(obj) / norm * self.loss_weight,
                "loss_rpn_loc": jnp.sum(reg) / norm * self.loss_weight,
            }

        pre_k = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post_k = self.post_nms_topk_train if train else self.post_nms_topk_test

        def predict(logit, delta):
            dec = self.box2box_transform.apply_deltas(
                jax.lax.stop_gradient(delta), anchors_all
            )
            score = jax.lax.stop_gradient(logit)
            k = min(pre_k, score.shape[0])
            topv, topi = jax.lax.top_k(score, k)
            bb = dec[topi]
            keep = nms_rotated_mask(bb, topv, self.nms_thresh)
            masked = jnp.where(keep, topv, -jnp.inf)
            k2 = min(post_k, k)
            top2, i2 = jax.lax.top_k(masked, k2)
            out_b = bb[i2]
            out_s = top2
            if post_k > k2:
                out_b = jnp.concatenate([out_b, jnp.zeros((post_k - k2, 5))])
                out_s = jnp.concatenate([out_s, jnp.full((post_k - k2,), -jnp.inf)])
            return out_b, out_s

        proposals, scores = jax.vmap(predict)(logits_flat, deltas_flat)
        return proposals, scores, losses

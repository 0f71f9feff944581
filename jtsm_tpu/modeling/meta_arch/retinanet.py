"""RetinaNet (reference: detectron2/modeling/meta_arch/retinanet.py:40; head
:505). Static-shape single-stage detector: focal loss over all anchors,
per-level topk -> class-aware NMS -> fixed K detections."""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec, get_norm
from ...ops.box_regression import Box2BoxTransform
from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.matcher import Matcher
from ...ops.nms import batched_nms_mask
from ...structures.boxes import clip_boxes, nonempty_boxes, pairwise_iou
from ..anchor_generator import build_anchor_generator
from ..backbone.build import build_backbone
from ..postprocessing import detector_postprocess_batched
from .build import META_ARCH_REGISTRY

Array = jax.Array


class RetinaNetHead(nn.Module):
    """Reference retinanet.py:505 — shared 4-conv cls/reg towers."""

    num_classes: int
    num_anchors: int
    num_convs: int = 4
    in_channels: int = 256
    prior_prob: float = 0.01
    norm: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]):
        cls_convs = [
            Conv2d(
                features=self.in_channels,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01),
                name=f"cls_subnet{i}",
            )
            for i in range(self.num_convs)
        ]
        reg_convs = [
            Conv2d(
                features=self.in_channels,
                kernel_size=3,
                padding=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01),
                name=f"bbox_subnet{i}",
            )
            for i in range(self.num_convs)
        ]
        # focal-loss prior: init cls bias so sigmoid ~= prior_prob
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = Conv2d(
            features=self.num_anchors * self.num_classes,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_value),
            name="cls_score",
        )
        bbox_pred = Conv2d(
            features=self.num_anchors * 4,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="bbox_pred",
        )
        logits, bbox_reg = [], []
        for f in features:
            c = f
            for conv in cls_convs:
                c = conv(c)
            logits.append(cls_score(c).astype(jnp.float32))
            r = f
            for conv in reg_convs:
                r = conv(r)
            bbox_reg.append(bbox_pred(r).astype(jnp.float32))
        return logits, bbox_reg


@META_ARCH_REGISTRY.register()
class RetinaNet(nn.Module):
    backbone: nn.Module
    head: nn.Module
    anchor_generator: Any
    box2box_transform: Box2BoxTransform
    anchor_matcher: Matcher
    num_classes: int
    in_features: Sequence[str]
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    nms_candidates_test: int = 1024  # NMS matrix cap (reference: none)
    focal_loss_alpha: float = 0.25
    focal_loss_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    score_thresh_test: float = 0.05
    topk_candidates_test: int = 1000
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        output_shape = backbone.output_shape()
        in_features = tuple(cfg.MODEL.RETINANET.IN_FEATURES)
        shapes = [output_shape[f] for f in in_features]
        anchor_generator = build_anchor_generator(cfg, shapes)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        head = RetinaNetHead(
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            num_anchors=anchor_generator.num_anchors[0],
            num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
            in_channels=shapes[0].channels,
            prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
            norm=cfg.MODEL.RETINANET.NORM,
            dtype=dtype,
        )
        return dict(
            backbone=backbone,
            head=head,
            anchor_generator=anchor_generator,
            box2box_transform=Box2BoxTransform(weights=cfg.MODEL.RETINANET.BBOX_REG_WEIGHTS),
            anchor_matcher=Matcher(
                cfg.MODEL.RETINANET.IOU_THRESHOLDS,
                cfg.MODEL.RETINANET.IOU_LABELS,
                allow_low_quality_matches=True,
            ),
            num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
            in_features=in_features,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            focal_loss_alpha=cfg.MODEL.RETINANET.FOCAL_LOSS_ALPHA,
            focal_loss_gamma=cfg.MODEL.RETINANET.FOCAL_LOSS_GAMMA,
            smooth_l1_beta=cfg.MODEL.RETINANET.SMOOTH_L1_LOSS_BETA,
            score_thresh_test=cfg.MODEL.RETINANET.SCORE_THRESH_TEST,
            topk_candidates_test=cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST,
            nms_thresh_test=cfg.MODEL.RETINANET.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        features_dict = self.backbone(images)
        feats = [features_dict[f] for f in self.in_features]
        logits_lvl, deltas_lvl = self.head(feats)

        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(grid_sizes)

        b = feats[0].shape[0]
        k = self.num_classes
        logits_flat = [l.reshape(b, -1, k) for l in logits_lvl]
        deltas_flat = [d.reshape(b, -1, 4) for d in deltas_lvl]

        if train:
            anchors_all = jnp.concatenate(anchors, axis=0)
            logits_all = jnp.concatenate(logits_flat, axis=1)
            deltas_all = jnp.concatenate(deltas_flat, axis=1)
            return self._losses(
                anchors_all,
                logits_all,
                deltas_all,
                batch["gt_boxes"],
                batch["gt_classes"],
                batch["gt_valid"],
            )
        detections = self._inference(
            anchors, logits_flat, deltas_flat, batch["image_sizes"]
        )
        return detector_postprocess_batched(
            detections, batch["image_sizes"], batch.get("orig_sizes", batch["image_sizes"])
        )

    def _losses(self, anchors, logits, deltas, gt_boxes, gt_classes, gt_valid):
        """Focal loss over valid anchors + smooth-l1 on positives, normalized
        by the number of positive anchors (reference retinanet.py losses; the
        reference also EMAs the normalizer — stateless normalization changes
        only very-early-training dynamics)."""

        def one(logit, delta, gt_b, gt_c, gt_v):
            iou = pairwise_iou(gt_b, anchors)
            matched_idx, match_labels = self.anchor_matcher(iou, gt_valid=gt_v)
            fg = match_labels == 1
            valid = match_labels != -1

            gt_classes_i = jnp.where(fg, gt_c[matched_idx], self.num_classes)
            targets_one_hot = (
                jax.nn.one_hot(gt_classes_i, self.num_classes + 1)[:, : self.num_classes]
            )
            cls_loss = sigmoid_focal_loss(
                logit, targets_one_hot, self.focal_loss_alpha, self.focal_loss_gamma
            ).sum(-1)
            cls_loss = jnp.sum(cls_loss * valid)

            matched_gt = gt_b[matched_idx]
            target_deltas = self.box2box_transform.get_deltas(anchors, matched_gt)
            reg = smooth_l1_loss(delta, target_deltas, self.smooth_l1_beta).sum(-1)
            reg_loss = jnp.sum(reg * fg)
            return cls_loss, reg_loss, jnp.sum(fg.astype(jnp.float32))

        cls_losses, reg_losses, num_pos = jax.vmap(one)(
            logits, deltas, gt_boxes, gt_classes, gt_valid
        )
        normalizer = jnp.maximum(jnp.sum(num_pos), 1.0)
        return {
            "loss_cls": jnp.sum(cls_losses) / normalizer,
            "loss_box_reg": jnp.sum(reg_losses) / normalizer,
        }

    def _inference(self, anchors, logits_flat, deltas_flat, image_sizes):
        def one(logits_i, deltas_i, size_i):
            cand_boxes, cand_scores, cand_classes = [], [], []
            for anc, lg, dl in zip(anchors, logits_i, deltas_i):
                probs = jax.nn.sigmoid(lg)  # (Ni, K)
                flat = probs.reshape(-1)
                n = flat.shape[0]
                kk = min(self.topk_candidates_test, n)
                topv, topi = jax.lax.top_k(flat, kk)
                anchor_idx = topi // self.num_classes
                cls_idx = (topi % self.num_classes).astype(jnp.int32)
                boxes = self.box2box_transform.apply_deltas(
                    dl[anchor_idx], anc[anchor_idx]
                )
                # NMS runs on the UNCLIPPED decoded boxes (reference
                # inference_single_image:449-492 — clipping happens only in
                # detector_postprocess afterwards)
                keep = topv > self.score_thresh_test
                cand_boxes.append(boxes)
                cand_scores.append(jnp.where(keep, topv, -jnp.inf))
                cand_classes.append(cls_idx)
            boxes = jnp.concatenate(cand_boxes, axis=0)
            scores = jnp.concatenate(cand_scores, axis=0)
            classes = jnp.concatenate(cand_classes, axis=0)
            # cap candidates for the NMS matrix (reference: uncapped)
            c = min(self.nms_candidates_test, scores.shape[0])
            top_scores, idx = jax.lax.top_k(scores, c)
            boxes, classes = boxes[idx], classes[idx]
            keep = batched_nms_mask(boxes, top_scores, classes, self.nms_thresh_test)
            final = jnp.where(keep, top_scores, -jnp.inf)
            d = min(self.detections_per_image, c)
            out_scores, oi = jax.lax.top_k(final, d)
            valid = jnp.isfinite(out_scores)
            return {
                "boxes": boxes[oi],
                "scores": jnp.where(valid, out_scores, 0.0),
                "classes": classes[oi],
                "valid": valid,
            }

        return jax.vmap(one)(
            [l for l in logits_flat], [d for d in deltas_flat], image_sizes
        )

"""TensorMask meta-architecture (reference:
projects/TensorMask/tensormask/arch.py:301; head :754; unit assignment :42).

Compact TPU formulation: a RetinaNet-style dense detector whose head also
predicts a V x V mask window per anchor location ("aligned" representation);
SwapAlign2Nat converts aligned->natural for losses/inference. Anchor units
are matched by IoU; mask supervision crops the matched GT mask into the
unit's window.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Conv2d
from jtsm_tpu.modeling.anchor_generator import build_anchor_generator
from jtsm_tpu.modeling.backbone.build import build_backbone
from jtsm_tpu.modeling.meta_arch.build import META_ARCH_REGISTRY
from jtsm_tpu.modeling.postprocessing import detector_postprocess_batched
from jtsm_tpu.ops.box_regression import Box2BoxTransform
from jtsm_tpu.ops.losses import binary_cross_entropy_with_logits, sigmoid_focal_loss, smooth_l1_loss
from jtsm_tpu.ops.matcher import Matcher
from jtsm_tpu.ops.nms import batched_nms_mask
from jtsm_tpu.structures.boxes import clip_boxes, nonempty_boxes, pairwise_iou
from jtsm_tpu.structures.masks import crop_and_resize_masks

Array = jax.Array


class TensorMaskHead(nn.Module):
    num_classes: int
    num_anchors: int
    num_convs: int = 4
    channels: int = 256
    mask_size: int = 15  # V
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]):
        import math

        towers = {}
        for branch in ("cls", "box", "mask"):
            towers[branch] = [
                Conv2d(
                    features=self.channels,
                    kernel_size=3,
                    padding=1,
                    activation=nn.relu,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f"{branch}_tower{i}",
                )
                for i in range(self.num_convs)
            ]
        bias = -math.log((1 - 0.01) / 0.01)
        cls_pred = Conv2d(
            features=self.num_anchors * self.num_classes,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias),
            name="cls_pred",
        )
        box_pred = Conv2d(
            features=self.num_anchors * 4,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="box_pred",
        )
        mask_pred = Conv2d(
            features=self.num_anchors * self.mask_size * self.mask_size,
            kernel_size=3,
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="mask_pred",
        )
        logits, boxes, masks = [], [], []
        for f in features:
            c = f
            for conv in towers["cls"]:
                c = conv(c)
            logits.append(cls_pred(c).astype(jnp.float32))
            b = f
            for conv in towers["box"]:
                b = conv(b)
            boxes.append(box_pred(b).astype(jnp.float32))
            m = f
            for conv in towers["mask"]:
                m = conv(m)
            masks.append(mask_pred(m).astype(jnp.float32))
        return logits, boxes, masks


@META_ARCH_REGISTRY.register()
class TensorMask(nn.Module):
    backbone: nn.Module
    head: nn.Module
    anchor_generator: Any
    box2box_transform: Box2BoxTransform
    anchor_matcher: Matcher
    num_classes: int
    in_features: Sequence[str]
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    mask_size: int = 15
    mask_loss_weight: float = 2.0
    focal_alpha: float = 0.3
    focal_gamma: float = 3.0
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        shapes = backbone.output_shape()
        in_features = tuple(cfg.MODEL.TENSOR_MASK.IN_FEATURES)
        feat_shapes = [shapes[f] for f in in_features]
        sub = cfg.clone()
        sub.defrost()
        sub.MODEL.ANCHOR_GENERATOR.SIZES = list(cfg.MODEL.TENSOR_MASK.ANCHOR_SIZES)[
            : len(in_features)
        ]
        sub.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
        anchor_generator = build_anchor_generator(sub, feat_shapes)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        head = TensorMaskHead(
            num_classes=cfg.MODEL.TENSOR_MASK.NUM_CLASSES,
            num_anchors=anchor_generator.num_anchors[0],
            num_convs=cfg.MODEL.TENSOR_MASK.NUM_CONVS,
            channels=feat_shapes[0].channels,
            dtype=dtype,
        )
        return dict(
            backbone=backbone,
            head=head,
            anchor_generator=anchor_generator,
            box2box_transform=Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0)),
            anchor_matcher=Matcher(
                cfg.MODEL.TENSOR_MASK.IOU_THRESHOLDS,
                cfg.MODEL.TENSOR_MASK.IOU_LABELS,
                allow_low_quality_matches=True,
            ),
            num_classes=cfg.MODEL.TENSOR_MASK.NUM_CLASSES,
            in_features=in_features,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            mask_loss_weight=cfg.MODEL.TENSOR_MASK.MASK_LOSS_WEIGHT,
            focal_alpha=cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_ALPHA,
            focal_gamma=cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_GAMMA,
            score_thresh=cfg.MODEL.TENSOR_MASK.SCORE_THRESH_TEST,
            nms_thresh=cfg.MODEL.TENSOR_MASK.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        feats_dict = self.backbone(images)
        feats = [feats_dict[f] for f in self.in_features]
        logits_lvl, boxes_lvl, masks_lvl = self.head(feats)

        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.concatenate(self.anchor_generator(grid_sizes), axis=0)

        b = feats[0].shape[0]
        k = self.num_classes
        v = self.mask_size
        logits = jnp.concatenate([l.reshape(b, -1, k) for l in logits_lvl], axis=1)
        deltas = jnp.concatenate([d.reshape(b, -1, 4) for d in boxes_lvl], axis=1)
        masks = jnp.concatenate(
            [m.reshape(b, -1, v * v) for m in masks_lvl], axis=1
        )

        if train:
            return self._losses(
                anchors,
                logits,
                deltas,
                masks,
                batch["gt_boxes"],
                batch["gt_classes"],
                batch["gt_valid"],
                batch.get("gt_mask_crops"),
            )
        dets = self._inference(anchors, logits, deltas, masks, batch["image_sizes"])
        return detector_postprocess_batched(
            dets, batch["image_sizes"], batch.get("orig_sizes", batch["image_sizes"])
        )

    def _losses(self, anchors, logits, deltas, masks, gt_boxes, gt_classes, gt_valid, gt_mask_crops):
        v = self.mask_size

        def one(logit, delta, mask, gt_b, gt_c, gt_v, crops):
            iou = pairwise_iou(gt_b, anchors)
            matched_idx, match_labels = self.anchor_matcher(iou, gt_valid=gt_v)
            fg = match_labels == 1
            valid = match_labels != -1
            cls_i = jnp.where(fg, gt_c[matched_idx], self.num_classes)
            onehot = jax.nn.one_hot(cls_i, self.num_classes + 1)[:, : self.num_classes]
            cls_loss = jnp.sum(
                sigmoid_focal_loss(logit, onehot, self.focal_alpha, self.focal_gamma).sum(-1)
                * valid
            )
            t = self.box2box_transform.get_deltas(anchors, gt_b[matched_idx])
            reg_loss = jnp.sum(smooth_l1_loss(delta, t, 0.1).sum(-1) * fg)

            # mask loss on a fixed budget of fg units
            cap = 64
            pri = jnp.where(fg, iou[matched_idx, jnp.arange(anchors.shape[0])], -jnp.inf)
            topv, topi = jax.lax.top_k(pri, cap)
            ok = jnp.isfinite(topv)
            unit_masks = mask[topi].reshape(cap, v, v)
            # target: matched gt mask crop resampled into the anchor window
            mi = matched_idx[topi]
            crop = crops[mi].astype(jnp.float32)  # (cap, M, M)
            gb = gt_b[mi]
            anc = anchors[topi]
            m = crop.shape[-1]
            gw = jnp.maximum(gb[:, 2] - gb[:, 0], 1e-6)
            gh = jnp.maximum(gb[:, 3] - gb[:, 1], 1e-6)
            rel = jnp.stack(
                [
                    (anc[:, 0] - gb[:, 0]) / gw * m,
                    (anc[:, 1] - gb[:, 1]) / gh * m,
                    (anc[:, 2] - gb[:, 0]) / gw * m,
                    (anc[:, 3] - gb[:, 1]) / gh * m,
                ],
                axis=1,
            )
            tgt = crop_and_resize_masks(crop, rel, v)
            ml = binary_cross_entropy_with_logits(
                unit_masks, (tgt >= 0.5).astype(jnp.float32)
            ).mean((1, 2))
            mask_loss = jnp.sum(ml * ok) / jnp.maximum(ok.sum(), 1.0)
            return cls_loss, reg_loss, mask_loss, fg.sum().astype(jnp.float32)

        if gt_mask_crops is None:
            gt_mask_crops = jnp.zeros(
                (gt_boxes.shape[0], gt_boxes.shape[1], v, v), jnp.float32
            )
        cls_l, reg_l, mask_l, npos = jax.vmap(one)(
            logits, deltas, masks, gt_boxes, gt_classes, gt_valid, gt_mask_crops
        )
        norm = jnp.maximum(npos.sum(), 1.0)
        return {
            "loss_cls": cls_l.sum() / norm,
            "loss_box_reg": reg_l.sum() / norm,
            "loss_mask": mask_l.mean() * self.mask_loss_weight,
        }

    def _inference(self, anchors, logits, deltas, masks, image_sizes):
        v = self.mask_size

        def one(logit, delta, mask, size):
            probs = jax.nn.sigmoid(logit)
            flat = probs.reshape(-1)
            c = min(1000, flat.shape[0])
            topv, topi = jax.lax.top_k(flat, c)
            a_idx = topi // self.num_classes
            cls = (topi % self.num_classes).astype(jnp.int32)
            bx = self.box2box_transform.apply_deltas(delta[a_idx], anchors[a_idx])
            bx = clip_boxes(bx, size)
            keepable = (topv > self.score_thresh) & nonempty_boxes(bx)
            sc = jnp.where(keepable, topv, -jnp.inf)
            keep = batched_nms_mask(bx, sc, cls, self.nms_thresh)
            final = jnp.where(keep, sc, -jnp.inf)
            d = min(self.detections_per_image, c)
            outv, oi = jax.lax.top_k(final, d)
            ok = jnp.isfinite(outv)
            return {
                "boxes": bx[oi],
                "scores": jnp.where(ok, outv, 0.0),
                "classes": cls[oi],
                "valid": ok,
                "masks": jax.nn.sigmoid(mask[a_idx[oi]].reshape(d, v, v)),
            }

        return jax.vmap(one)(logits, deltas, masks, image_sizes)

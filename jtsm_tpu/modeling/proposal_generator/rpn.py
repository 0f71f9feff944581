"""Region Proposal Network (reference:
detectron2/modeling/proposal_generator/rpn.py:68 ``StandardRPNHead``, :143
``RPN``).

Static-shape TPU re-design:
* GT comes in as padded (B, G, 4) + validity mask instead of per-image lists;
* anchor labeling/sampling/losses are vmapped over the batch;
* proposal selection returns fixed (B, K, 4) with -inf-score padding.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import Conv2d, ShapeSpec
from ...ops.box_regression import Box2BoxTransform
from ...ops.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from ...ops.matcher import Matcher
from ...ops.sampling import subsample_labels
from ...structures.boxes import pairwise_iou
from ...utils.registry import Registry
from ..anchor_generator import build_anchor_generator
from .proposal_utils import find_top_rpn_proposals_single

PROPOSAL_GENERATOR_REGISTRY = Registry("PROPOSAL_GENERATOR")
RPN_HEAD_REGISTRY = Registry("RPN_HEAD")

Array = jax.Array


@RPN_HEAD_REGISTRY.register()
class StandardRPNHead(nn.Module):
    """3x3 conv -> (objectness 1x1, deltas 1x1); shared across levels
    (reference rpn.py:68)."""

    in_channels: int
    num_anchors: int
    box_dim: int = 4
    conv_dims: Sequence[int] = (-1,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]):
        convs = []
        for i, cd in enumerate(self.conv_dims):
            out_c = self.in_channels if cd == -1 else cd
            convs.append(
                Conv2d(
                    features=out_c,
                    kernel_size=3,
                    padding=1,
                    activation=nn.relu,
                    dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.01),
                    name=f"conv{i}" if len(self.conv_dims) > 1 else "conv",
                )
            )
        objectness = Conv2d(
            features=self.num_anchors,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="objectness_logits",
        )
        deltas = Conv2d(
            features=self.num_anchors * self.box_dim,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="anchor_deltas",
        )
        logits, bbox_deltas = [], []
        for x in features:
            t = x
            for conv in convs:
                t = conv(t)
            logits.append(objectness(t))
            bbox_deltas.append(deltas(t))
        return logits, bbox_deltas


@PROPOSAL_GENERATOR_REGISTRY.register()
class RPN(nn.Module):
    """Reference rpn.py:143. Module-level attributes are static config."""

    in_features: Sequence[str]
    head: nn.Module
    anchor_generator: Any
    anchor_matcher: Matcher
    box2box_transform: Box2BoxTransform
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_topk_train: int = 12000
    pre_nms_topk_test: int = 6000
    post_nms_topk_train: int = 2000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    boundary_threshold: float = -1.0
    loss_weight: float = 1.0
    box_reg_loss_weight: float = 1.0
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    # "rpn_head" in TPU.REMAT: recompute the conv tower (finest-level
    # activations are res2-sized) on the backward pass
    remat: bool = False

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.RPN.IN_FEATURES)
        shapes = [input_shape[f] for f in in_features]
        anchor_generator = build_anchor_generator(cfg, shapes)
        num_anchors = anchor_generator.num_anchors
        assert len(set(num_anchors)) == 1, "all levels must share anchor count"
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        head = RPN_HEAD_REGISTRY.get(cfg.MODEL.RPN.HEAD_NAME)(
            in_channels=shapes[0].channels,
            num_anchors=num_anchors[0],
            box_dim=anchor_generator.box_dim,
            conv_dims=tuple(cfg.MODEL.RPN.CONV_DIMS),
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
            box2box_transform=Box2BoxTransform(weights=cfg.MODEL.RPN.BBOX_REG_WEIGHTS),
            batch_size_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            pre_nms_topk_train=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
            post_nms_topk_train=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
            post_nms_topk_test=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
            nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            min_box_size=float(cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE),
            boundary_threshold=float(cfg.MODEL.RPN.BOUNDARY_THRESH),
            loss_weight=cfg.MODEL.RPN.LOSS_WEIGHT,
            box_reg_loss_weight=cfg.MODEL.RPN.BBOX_REG_LOSS_WEIGHT,
            smooth_l1_beta=cfg.MODEL.RPN.SMOOTH_L1_BETA,
            box_reg_loss_type=cfg.MODEL.RPN.BBOX_REG_LOSS_TYPE,
            remat="rpn_head" in cfg.TPU.REMAT,
        )

    @nn.compact
    def __call__(
        self,
        images_sizes: Array,  # (B, 2) true sizes
        features: Dict[str, Array],
        gt_boxes: Optional[Array] = None,  # (B, G, 4)
        gt_valid: Optional[Array] = None,  # (B, G)
        train: bool = False,
        defer_losses: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        # subclass hook: TridentRPN tiles sizes/GT when branches are folded
        # into the feature batch (reference trident_rpn.py duplicates images)
        images_sizes, gt_boxes, gt_valid = self._adapt_inputs(
            feats[0].shape[0], images_sizes, gt_boxes, gt_valid
        )
        if train and self.remat:
            logits_per_level, deltas_per_level = nn.remat(
                lambda mdl, fs: mdl(fs)
            )(self.head, feats)
        else:
            logits_per_level, deltas_per_level = self.head(feats)

        grid_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = self.anchor_generator(grid_sizes)  # list of (Ni, 4) constants

        b = feats[0].shape[0]
        a = self.anchor_generator.num_anchors[0]
        box_dim = self.anchor_generator.box_dim
        # (B, Ni) / (B, Ni, 4) flattened per level
        logits_flat = [
            l.astype(jnp.float32).reshape(b, -1) for l in logits_per_level
        ]
        deltas_flat = [
            d.astype(jnp.float32).reshape(b, -1, box_dim) for d in deltas_per_level
        ]

        losses = {}
        if train and defer_losses:
            # UWSOD mode (reference wsl rcnn.py:169-178): the ground truth is
            # PGT mined downstream by the roi heads, so the caller computes
            # losses later via get_losses() on this aux.
            losses = {
                "_deferred": {
                    "anchors": jnp.concatenate(anchors, axis=0),
                    "logits": jnp.concatenate(logits_flat, axis=1),
                    "deltas": jnp.concatenate(deltas_flat, axis=1),
                    "image_sizes": images_sizes,
                }
            }
        elif train:
            assert gt_boxes is not None and gt_valid is not None
            rng = self.make_rng("sampling")
            losses = self._losses(
                rng,
                jnp.concatenate(anchors, axis=0),
                jnp.concatenate(logits_flat, axis=1),
                jnp.concatenate(deltas_flat, axis=1),
                gt_boxes,
                gt_valid,
                images_sizes,
            )

        proposals, prop_scores = self._predict_proposals(
            anchors, logits_flat, deltas_flat, images_sizes, train
        )
        return proposals, prop_scores, losses

    def _adapt_inputs(self, feature_batch, image_sizes, gt_boxes, gt_valid):
        return image_sizes, gt_boxes, gt_valid

    def get_losses(self, rng, deferred, gt_boxes, gt_valid):
        """Compute the RPN losses from a ``_deferred`` aux (see ``defer_losses``)
        against ground truth that only became available after the forward —
        UWSOD's PGT mined by the roi heads (reference
        wsl/modeling/meta_arch/rcnn.py:178 ``proposal_generator.get_losses``)."""
        _, gt_boxes, gt_valid = self._adapt_inputs(
            deferred["logits"].shape[0],
            deferred["image_sizes"],
            gt_boxes,
            gt_valid,
        )
        return self._losses(
            rng,
            deferred["anchors"],
            deferred["logits"],
            deferred["deltas"],
            gt_boxes,
            gt_valid,
            deferred["image_sizes"],
        )

    def _losses(self, rng, anchors, logits, deltas, gt_boxes, gt_valid, image_sizes):
        """anchors (N, 4); logits (B, N); deltas (B, N, 4); image_sizes (B, 2)."""
        b = logits.shape[0]
        rngs = jax.random.split(rng, b)

        def one(rng_i, logit, delta, gt_b, gt_v, size_i):
            iou = pairwise_iou(gt_b, anchors)  # (G, N)
            matched_idx, match_labels = self.anchor_matcher(iou, gt_valid=gt_v)
            if self.boundary_threshold >= 0:
                # reference rpn.py: anchors that leave the image by more than
                # BOUNDARY_THRESH pixels are ignored (label -1), a legacy
                # Faster R-CNN option
                t = self.boundary_threshold
                h = size_i[0].astype(jnp.float32)
                w = size_i[1].astype(jnp.float32)
                inside = (
                    (anchors[:, 0] >= -t)
                    & (anchors[:, 1] >= -t)
                    & (anchors[:, 2] < w + t)
                    & (anchors[:, 3] < h + t)
                )
                match_labels = jnp.where(inside, match_labels, -1)
            pos_mask, neg_mask = subsample_labels(
                rng_i,
                match_labels.astype(jnp.int32),
                self.batch_size_per_image,
                self.positive_fraction,
                bg_label=0,
            )
            # objectness: pos -> 1, neg -> 0
            sampled = pos_mask | neg_mask
            obj_targets = pos_mask.astype(jnp.float32)
            obj_loss = jnp.sum(
                binary_cross_entropy_with_logits(logit, obj_targets) * sampled
            )

            matched_gt = gt_b[matched_idx]  # (N, 4)
            if self.box_reg_loss_type == "smooth_l1":
                target_deltas = self.box2box_transform.get_deltas(anchors, matched_gt)
                reg = smooth_l1_loss(delta, target_deltas, self.smooth_l1_beta)
                reg_loss = jnp.sum(reg * pos_mask[:, None])
            else:  # giou
                from ...ops.losses import giou_loss

                pred_boxes = self.box2box_transform.apply_deltas(
                    delta.reshape(-1, 4), anchors
                )
                reg_loss = jnp.sum(giou_loss(pred_boxes, matched_gt) * pos_mask)
            return obj_loss, reg_loss

        obj_losses, reg_losses = jax.vmap(one)(
            rngs, logits, deltas, gt_boxes, gt_valid, image_sizes
        )
        normalizer = self.batch_size_per_image * b
        return {
            "loss_rpn_cls": jnp.sum(obj_losses) / normalizer * self.loss_weight,
            "loss_rpn_loc": jnp.sum(reg_losses)
            / normalizer
            * self.loss_weight
            * self.box_reg_loss_weight,
        }

    def _predict_proposals(self, anchors, logits_flat, deltas_flat, image_sizes, train):
        pre_k = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post_k = self.post_nms_topk_train if train else self.post_nms_topk_test

        def one(logits_i, deltas_i, size_i):
            # top-k on raw objectness FIRST, then decode only the survivors
            # (decoding all ~240k anchors/image materializes GBs of
            # intermediates; the selected 1k/level is ~200x less traffic).
            # Gradients are cut: proposals are "data".
            boxes_lvls = []
            score_lvls = []
            for anc, lg, dl in zip(anchors, logits_i, deltas_i):
                lg = jax.lax.stop_gradient(lg)
                k = min(pre_k, lg.shape[0])
                topv, topi = jax.lax.top_k(lg, k)
                dec = self.box2box_transform.apply_deltas(
                    jax.lax.stop_gradient(dl)[topi], anc[topi]
                )
                boxes_lvls.append(dec)
                score_lvls.append(topv)
            return find_top_rpn_proposals_single(
                boxes_lvls,
                score_lvls,
                size_i,
                self.nms_thresh,
                pre_k,
                post_k,
                self.min_box_size,
            )

        # split per level lists for vmap: transpose to per-image pytrees
        b = logits_flat[0].shape[0]
        return jax.vmap(one)(
            [l for l in logits_flat], [d for d in deltas_flat], image_sizes
        )


def build_rpn_head(cfg: CfgNode, input_shape: List[ShapeSpec]):
    """Reference proposal_generator/rpn.py:34 ``build_rpn_head`` — construct
    the RPN head named by MODEL.RPN.HEAD_NAME over the given level shapes."""
    anchor_generator = build_anchor_generator(cfg, input_shape)
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return RPN_HEAD_REGISTRY.get(cfg.MODEL.RPN.HEAD_NAME)(
        in_channels=input_shape[0].channels,
        num_anchors=anchor_generator.num_anchors[0],
        box_dim=anchor_generator.box_dim,
        conv_dims=tuple(cfg.MODEL.RPN.CONV_DIMS),
        dtype=dtype,
    )


def build_proposal_generator(cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
    name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
    if name == "PrecomputedProposals":
        return None
    cls_ = PROPOSAL_GENERATOR_REGISTRY.get(name)
    kwargs = cls_.from_config(cfg, input_shape)
    return cls_(**kwargs)

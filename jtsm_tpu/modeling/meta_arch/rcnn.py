"""GeneralizedRCNN / ProposalNetwork meta-architectures.

Reference: detectron2/modeling/meta_arch/rcnn.py:24 (preprocess -> backbone
-> RPN -> roi_heads; :177 inference; :233 postprocess), :249
(``ProposalNetwork``).

TPU input contract (replaces the reference's list-of-dicts):
``batch`` is a dict of batched arrays with static shapes:
  image:        (B, H, W, 3) float32, raw pixel scale, channel order per cfg
  image_sizes:  (B, 2) int32 true (h, w) inside the padded canvas
  orig_sizes:   (B, 2) int32 original sizes (inference postprocess)
  gt_boxes:     (B, G, 4) float32        (training)
  gt_classes:   (B, G) int32             (training)
  gt_valid:     (B, G) bool              (training)
  gt_mask_crops:(B, G, M, M) bool        (training, MASK_ON)
  proposals / proposal_scores: (B, K, 4)/(B, K)  (LOAD_PROPOSALS)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ..backbone.build import build_backbone
from ..postprocessing import detector_postprocess_batched
from ..proposal_generator.rpn import build_proposal_generator
from ..roi_heads.roi_heads import build_roi_heads
from .build import META_ARCH_REGISTRY

Array = jax.Array


@META_ARCH_REGISTRY.register()
class GeneralizedRCNN(nn.Module):
    backbone: nn.Module
    proposal_generator: Optional[nn.Module]
    roi_heads: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    # TPU.REMAT scopes (activation rematerialization); "backbone" wraps the
    # whole backbone call in jax.checkpoint during training so only the
    # output feature maps are stored for the backward pass
    remat_scopes: Sequence[str] = ()

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        output_shape = backbone.output_shape()
        return dict(
            backbone=backbone,
            proposal_generator=build_proposal_generator(cfg, output_shape),
            roi_heads=build_roi_heads(cfg, output_shape),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            remat_scopes=tuple(cfg.TPU.REMAT),
        )

    def preprocess_image(self, images: Array) -> Array:
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        return (images - mean) / std

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        images = self.preprocess_image(batch["image"])
        image_sizes = batch["image_sizes"]
        if train and "backbone" in self.remat_scopes:
            features = nn.remat(lambda mdl, x: mdl(x))(self.backbone, images)
        else:
            features = self.backbone(images)

        if not train and "detected_boxes" in batch:
            # inference on externally provided boxes (reference rcnn.py
            # ``inference(detected_instances=...)`` used by TTA): skip the
            # proposal generator and box head, run only the per-box branches
            b, d = batch["detected_boxes"].shape[:2]
            detections = {
                "boxes": batch["detected_boxes"],
                "classes": batch["detected_classes"],
                "scores": batch.get("detected_scores", jnp.ones((b, d))),
                "valid": batch.get("detected_valid", jnp.ones((b, d), bool)),
            }
            detections = self.roi_heads.forward_with_given_boxes(
                features, detections
            )
            # boxes stay in network-input coords: the caller owns the mapping
            return detections

        if self.proposal_generator is not None:
            proposals, prop_scores, rpn_losses = self.proposal_generator(
                image_sizes,
                features,
                batch.get("gt_boxes"),
                batch.get("gt_valid"),
                train=train,
            )
        else:
            proposals = batch["proposals"]
            prop_scores = batch["proposal_scores"]
            rpn_losses = {}

        # all gt_* fields flow to the roi heads; subclass branches (e.g.
        # DensePose dp point targets) consume their own keys
        targets = (
            {k: batch[k] for k in batch if k.startswith("gt_")} if train else None
        )
        detections, roi_losses = self.roi_heads(
            features, proposals, prop_scores, image_sizes, targets, train=train
        )

        if train:
            return {**rpn_losses, **roi_losses}
        return detector_postprocess_batched(
            detections, image_sizes, batch.get("orig_sizes", image_sizes)
        )


@META_ARCH_REGISTRY.register()
class ProposalNetwork(nn.Module):
    """RPN-only network (reference rcnn.py:249)."""

    backbone: nn.Module
    proposal_generator: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        return dict(
            backbone=backbone,
            proposal_generator=build_proposal_generator(cfg, backbone.output_shape()),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        images = (batch["image"] - mean) / std
        features = self.backbone(images)
        proposals, prop_scores, rpn_losses = self.proposal_generator(
            batch["image_sizes"],
            features,
            batch.get("gt_boxes"),
            batch.get("gt_valid"),
            train=train,
        )
        if train:
            return rpn_losses
        # rescale to original-image coordinates like detections (reference
        # rcnn.py:249 ProposalNetwork postprocesses with detector_postprocess)
        from ..postprocessing import detector_postprocess_batched

        post = detector_postprocess_batched(
            {"boxes": proposals},
            batch["image_sizes"],
            batch.get("orig_sizes", batch["image_sizes"]),
        )
        return {"proposals": post["boxes"], "scores": prop_scores}

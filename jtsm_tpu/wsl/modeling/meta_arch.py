"""WSL meta-architectures.

Reference:
* GeneralizedRCNNWSL — projects/WSL/wsl/modeling/meta_arch/rcnn.py:24
  (precomputed proposals; inference also returns all_scores/all_boxes)
* GeneralizedMCNNWSL (JTSM) — wsl/modeling/meta_arch/mcnn.py:25: forward
  preprocesses image + superpixel map (:312), runs the JTSM roi heads with
  superpixels, then trains the sem-seg head on the roi-heads' mined
  ``pgt_sem_seg`` (:228); panoptic inference combines instance + stuff
  outputs with the PanopticFPN fusion (:351-358).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers.wrappers import interpolate_bilinear
from ...modeling.backbone.build import build_backbone
from ...modeling.meta_arch.build import META_ARCH_REGISTRY
from ...modeling.meta_arch.semantic_seg import build_sem_seg_head
from ...modeling.postprocessing import detector_postprocess_batched
from ...modeling.proposal_generator.rpn import build_proposal_generator
from ...modeling.roi_heads.roi_heads import build_roi_heads

Array = jax.Array


@META_ARCH_REGISTRY.register()
class GeneralizedRCNNWSL(nn.Module):
    """WSOD umbrella: precomputed proposals -> WSL roi heads.

    With a learned ``proposal_generator`` (UWSOD's RPNWSL, reference
    wsl/modeling/meta_arch/rcnn.py:169-178), the RPN produces the proposals
    and its losses are computed AFTER the roi heads run, against the PGT
    the heads mined (``pgt_boxes``/``pgt_valid`` in their train aux)."""

    backbone: nn.Module
    roi_heads: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    proposal_generator: Optional[nn.Module] = None
    # TPU.REMAT scopes ("backbone" = jax.checkpoint the whole backbone call)
    remat_scopes: Sequence[str] = ()

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        return dict(
            backbone=backbone,
            roi_heads=build_roi_heads(cfg, backbone.output_shape()),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            proposal_generator=build_proposal_generator(cfg, backbone.output_shape()),
            remat_scopes=tuple(cfg.TPU.REMAT),
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        if train and "backbone" in self.remat_scopes:
            features = nn.remat(lambda mdl, x: mdl(x))(self.backbone, images)
        else:
            features = self.backbone(images)
        deferred = None
        if self.proposal_generator is not None:
            proposals, prop_scores, rpn_out = self.proposal_generator(
                batch["image_sizes"], features, train=train, defer_losses=True
            )
            deferred = rpn_out.get("_deferred") if train else None
            proposals = jax.lax.stop_gradient(proposals)
            prop_scores = jax.lax.stop_gradient(prop_scores)
        else:
            proposals = batch["proposals"]
            prop_scores = batch["proposal_scores"]
        targets = (
            {
                k: batch[k]
                for k in ("gt_classes", "gt_valid", "gt_boxes", "cpg")
                if k in batch
            }
            if train
            else None
        )
        detections, losses = self.roi_heads(
            features, proposals, prop_scores, batch["image_sizes"], targets, train=train
        )
        if train:
            if deferred is not None:
                aux = detections if isinstance(detections, dict) else {}
                pgt_boxes = aux.get("pgt_boxes")
                if pgt_boxes is not None:
                    losses.update(
                        self.proposal_generator.get_losses(
                            self.make_rng("sampling"),
                            deferred,
                            jax.lax.stop_gradient(pgt_boxes),
                            aux["pgt_valid"],
                        )
                    )
            return losses
        return detector_postprocess_batched(
            detections, batch["image_sizes"], batch.get("orig_sizes", batch["image_sizes"])
        )


@META_ARCH_REGISTRY.register()
class GeneralizedMCNNWSL(nn.Module):
    """The JTSM meta-architecture (thing + stuff)."""

    backbone: nn.Module
    roi_heads: nn.Module
    sem_seg_head: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    # TPU.REMAT scopes ("backbone" = jax.checkpoint the whole backbone call)
    remat_scopes: Sequence[str] = ()

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        output_shape = backbone.output_shape()
        return dict(
            backbone=backbone,
            roi_heads=build_roi_heads(cfg, output_shape),
            sem_seg_head=build_sem_seg_head(cfg, output_shape),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            remat_scopes=tuple(cfg.TPU.REMAT),
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        if train and "backbone" in self.remat_scopes:
            features = nn.remat(lambda mdl, x: mdl(x))(self.backbone, images)
        else:
            features = self.backbone(images)

        if not train and "detected_boxes" in batch:
            # mask-only inference on externally provided boxes (TTA mask
            # re-run on merged boxes, reference _rescale_detected_boxes +
            # _reduce_pred_masks); boxes stay in network-input coords
            b, d = batch["detected_boxes"].shape[:2]
            detections = {
                "boxes": batch["detected_boxes"],
                "classes": batch["detected_classes"],
                "scores": batch.get("detected_scores", jnp.ones((b, d))),
                "valid": batch.get("detected_valid", jnp.ones((b, d), bool)),
            }
            return self.roi_heads.forward_with_given_boxes(features, detections)

        proposals = batch["proposals"]
        prop_scores = batch["proposal_scores"]
        superpixels = batch.get("superpixels")
        oh_labels = batch.get("oh_labels")

        targets = (
            {
                k: batch[k]
                for k in ("gt_classes", "gt_valid", "gt_boxes", "gt_sem_seg")
                if k in batch
            }
            if train
            else None
        )

        aux, roi_losses = (None, None)
        out, losses_or_empty = self.roi_heads(
            features,
            proposals,
            prop_scores,
            batch["image_sizes"],
            targets,
            train=train,
            superpixels=superpixels,
            oh_labels=oh_labels,
            images=batch["image"],  # raw pixels for GrabCut object evidence
        )

        if train:
            losses = dict(losses_or_empty)
            # stuff branch trained on the ROI-heads' mined pseudo sem-seg
            # (reference mcnn.py:228)
            pgt = out.get("pgt_sem_seg") if isinstance(out, dict) else None
            if pgt is not None:
                sem_kwargs = (
                    {"images": batch["image"]}
                    if getattr(self.sem_seg_head, "use_crf", False)
                    else {}
                )
                _, sem_losses = self.sem_seg_head(
                    features,
                    pgt,
                    train=True,
                    targets_stride=out.get("pgt_sem_seg_stride", 1),
                    **sem_kwargs,
                )
                losses.update(sem_losses)
            return losses

        detections = detector_postprocess_batched(
            out, batch["image_sizes"], batch.get("orig_sizes", batch["image_sizes"])
        )
        sem_kwargs = (
            {"images": batch["image"]}
            if getattr(self.sem_seg_head, "use_crf", False)
            else {}
        )
        sem_logits, _ = self.sem_seg_head(features, None, train=False, **sem_kwargs)
        h, w = batch["image"].shape[1], batch["image"].shape[2]
        sem_up = interpolate_bilinear(sem_logits, (h, w))
        detections["sem_seg"] = jnp.argmax(sem_up, axis=-1).astype(jnp.int32)
        detections["sem_seg_logits"] = sem_up
        return detections

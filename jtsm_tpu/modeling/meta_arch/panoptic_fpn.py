"""Panoptic FPN (reference: detectron2/modeling/meta_arch/panoptic_fpn.py:20;
fusion :133 ``combine_semantic_and_instance_outputs``).

The network is jitted (instance + semantic branches); the panoptic fusion is
a host-side numpy pass over at most DETECTIONS_PER_IMAGE instances — it is
sequential by construction (paint in confidence order) and runs once per
image at eval time.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...config import CfgNode
from ..backbone.build import build_backbone
from ..postprocessing import detector_postprocess_batched
from ..proposal_generator.rpn import build_proposal_generator
from ..roi_heads.roi_heads import build_roi_heads
from .build import META_ARCH_REGISTRY
from .semantic_seg import build_sem_seg_head

Array = jax.Array


@META_ARCH_REGISTRY.register()
class PanopticFPN(nn.Module):
    backbone: nn.Module
    proposal_generator: nn.Module
    roi_heads: nn.Module
    sem_seg_head: nn.Module
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    instance_loss_weight: float = 1.0
    combine_enabled: bool = True
    combine_overlap_thresh: float = 0.5
    combine_stuff_area_limit: int = 4096
    combine_instances_confidence_thresh: float = 0.5

    @classmethod
    def from_config(cls, cfg: CfgNode):
        backbone = build_backbone(cfg)
        output_shape = backbone.output_shape()
        return dict(
            backbone=backbone,
            proposal_generator=build_proposal_generator(cfg, output_shape),
            roi_heads=build_roi_heads(cfg, output_shape),
            sem_seg_head=build_sem_seg_head(cfg, output_shape),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            instance_loss_weight=cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT,
            combine_enabled=cfg.MODEL.PANOPTIC_FPN.COMBINE.ENABLED,
            combine_overlap_thresh=cfg.MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH,
            combine_stuff_area_limit=cfg.MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT,
            combine_instances_confidence_thresh=(
                cfg.MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH
            ),
        )

    @nn.compact
    def __call__(self, batch: Dict[str, Array], train: bool = False):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        images = (batch["image"] - mean) / std
        image_sizes = batch["image_sizes"]
        features = self.backbone(images)

        sem_logits, sem_losses = self.sem_seg_head(
            features, batch.get("gt_sem_seg"), train=train
        )

        proposals, prop_scores, rpn_losses = self.proposal_generator(
            image_sizes, features, batch.get("gt_boxes"), batch.get("gt_valid"), train=train
        )
        targets = (
            {
                k: batch[k]
                for k in ("gt_boxes", "gt_classes", "gt_valid", "gt_mask_crops")
                if k in batch
            }
            if train
            else None
        )
        detections, roi_losses = self.roi_heads(
            features, proposals, prop_scores, image_sizes, targets, train=train
        )

        if train:
            losses = dict(sem_losses)
            losses.update(
                {k: v * self.instance_loss_weight for k, v in roi_losses.items()}
            )
            losses.update(rpn_losses)
            return losses

        from ...layers.wrappers import interpolate_bilinear

        h, w = batch["image"].shape[1], batch["image"].shape[2]
        sem_up = interpolate_bilinear(sem_logits, (h, w))
        out = detector_postprocess_batched(
            detections, image_sizes, batch.get("orig_sizes", image_sizes)
        )
        out["sem_seg"] = jnp.argmax(sem_up, axis=-1).astype(jnp.int32)
        out["sem_seg_logits"] = sem_up
        return out


def combine_semantic_and_instance_outputs(
    instance_masks: np.ndarray,  # (D, H, W) bool full-res masks
    instance_scores: np.ndarray,  # (D,)
    instance_classes: np.ndarray,  # (D,)
    instance_valid: np.ndarray,  # (D,)
    semantic_seg: np.ndarray,  # (H, W) int
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_confidence_threshold: float = 0.5,
) -> Tuple[np.ndarray, List[dict]]:
    """Reference panoptic_fpn.py:133 — greedy confidence-ordered painting.
    Returns (panoptic id map, segment infos)."""
    panoptic_seg = np.zeros_like(semantic_seg, dtype=np.int32)
    current_segment_id = 0
    segments_info: List[dict] = []

    order = np.argsort(-instance_scores)
    for i in order:
        if not instance_valid[i]:
            continue
        score = float(instance_scores[i])
        if score < instances_confidence_threshold:
            break
        mask = instance_masks[i]
        mask_area = int(mask.sum())
        if mask_area == 0:
            continue
        intersect = mask & (panoptic_seg > 0)
        intersect_area = int(intersect.sum())
        if intersect_area * 1.0 / mask_area > overlap_threshold:
            continue
        if intersect_area > 0:
            mask = mask & (panoptic_seg == 0)
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": True,
                "score": score,
                "category_id": int(instance_classes[i]),
                "instance_id": int(i),
                "area": int(mask.sum()),
            }
        )

    # stuff regions
    semantic_labels = np.unique(semantic_seg)
    for semantic_label in semantic_labels:
        if semantic_label == 0:  # 0 is the "thing" class in separated sem-seg
            continue
        mask = (semantic_seg == semantic_label) & (panoptic_seg == 0)
        mask_area = int(mask.sum())
        if mask_area < stuff_area_limit:
            continue
        current_segment_id += 1
        panoptic_seg[mask] = current_segment_id
        segments_info.append(
            {
                "id": current_segment_id,
                "isthing": False,
                "category_id": int(semantic_label),
                "area": mask_area,
            }
        )
    return panoptic_seg, segments_info


def _bilinear_resize_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) float -> (out_h, out_w, C), half-pixel centers (matches
    jax.image.resize / F.interpolate align_corners=False)."""
    h, w = x.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    out = (
        x[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + x[np.ix_(y0, x1)] * (1 - fy) * fx
        + x[np.ix_(y1, x0)] * fy * (1 - fx)
        + x[np.ix_(y1, x1)] * fy * fx
    )
    return out


def panoptic_fusion_postprocess(
    outputs: Dict[str, np.ndarray],  # batched model outputs (boxes at orig scale)
    image_sizes: np.ndarray,  # (B, 2) true network-input sizes (pre-pad)
    orig_sizes: np.ndarray,  # (B, 2) original image sizes
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_confidence_threshold: float = 0.5,
    mask_threshold: float = 0.5,
) -> Dict[str, Any]:
    """Host-side eval-time fusion (the reference runs this in
    ``PanopticFPN.inference`` :109-130 and ``GeneralizedMCNNWSL
    ._postprocess_ps``, mcnn.py:336,351-358): per image, resize the sem-seg
    logits to the original resolution, paste the instance mask crops, and
    paint a panoptic id map.

    Adds to ``outputs``:
    * ``panoptic_seg``: list of (id_map (H0, W0) int32, segments_info)
    * ``sem_seg``: list of per-image (H0, W0) argmax maps at original res
    """
    from ...evaluation.coco_evaluation import _paste_mask_np

    b = int(np.asarray(outputs["scores"]).shape[0])
    sem_logits = np.asarray(outputs["sem_seg_logits"], np.float32)
    boxes = np.asarray(outputs["boxes"], np.float32)
    scores = np.asarray(outputs["scores"], np.float32)
    classes = np.asarray(outputs["classes"], np.int32)
    valid = np.asarray(outputs.get("valid", np.ones(scores.shape, bool)), bool)
    masks = outputs.get("masks")
    if masks is None and "masks_full" in outputs:
        masks = outputs["masks_full"]
    no_paste = outputs.get("no_paste")  # (B, D) full-image masks flag (WSL)

    panoptic, sem_maps = [], []
    for i in range(b):
        h, w = int(image_sizes[i][0]), int(image_sizes[i][1])
        h0, w0 = int(orig_sizes[i][0]), int(orig_sizes[i][1])
        # logits are at (padded) input resolution: crop to the true size
        logit_i = sem_logits[i][:h, :w]
        sem_up = _bilinear_resize_np(logit_i, h0, w0)
        semantic = np.argmax(sem_up, axis=-1).astype(np.int32)
        sem_maps.append(semantic)

        d = scores.shape[1]
        inst_masks = np.zeros((d, h0, w0), bool)
        inst_valid = valid[i].copy()
        if masks is not None:
            for j in range(d):
                # combine() never reads masks below the confidence threshold
                if not inst_valid[j] or scores[i, j] < instances_confidence_threshold:
                    continue
                if no_paste is not None and bool(no_paste[i, j]):
                    # mask already full-image at network-input res (WSL
                    # superpixel path emits ``masks_full``): crop + resize
                    src = outputs.get("masks_full", masks)
                    m = np.asarray(src[i, j], np.float32)
                    full = _bilinear_resize_np(m[:h, :w, None], h0, w0)[..., 0]
                    inst_masks[j] = full >= mask_threshold
                else:
                    m = np.asarray(masks[i, j], np.float32)
                    inst_masks[j] = _paste_mask_np(
                        m, boxes[i, j], h0, w0, mask_threshold
                    )
        else:
            # box-only models: use the box as the mask
            for j in range(d):
                if not inst_valid[j]:
                    continue
                x0, y0, x1, y1 = boxes[i, j]
                x0, y0 = max(int(x0), 0), max(int(y0), 0)
                x1, y1 = min(int(np.ceil(x1)), w0), min(int(np.ceil(y1)), h0)
                if x1 > x0 and y1 > y0:
                    inst_masks[j, y0:y1, x0:x1] = True

        id_map, segments = combine_semantic_and_instance_outputs(
            inst_masks,
            scores[i],
            classes[i],
            inst_valid,
            semantic,
            overlap_threshold,
            stuff_area_limit,
            instances_confidence_threshold,
        )
        panoptic.append((id_map, segments))

    out = dict(outputs)
    out["panoptic_seg"] = panoptic
    out["sem_seg"] = sem_maps
    return out

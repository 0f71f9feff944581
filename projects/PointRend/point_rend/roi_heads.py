"""PointRendROIHeads (reference:
projects/PointRend/point_rend/roi_heads.py — coarse mask head + iterative
point-based subdivision refinement)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Linear, ShapeSpec, interpolate_bilinear
from jtsm_tpu.modeling.roi_heads.mask_head import (
    ROI_MASK_HEAD_REGISTRY,
    mask_targets_from_crops,
)
from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY, StandardROIHeads
from jtsm_tpu.ops.losses import binary_cross_entropy_with_logits

from .point_features import (
    calculate_uncertainty,
    get_uncertain_point_coords_on_grid,
    get_uncertain_point_coords_with_randomness,
    point_sample,
)
from .point_head import StandardPointHead

Array = jax.Array


@ROI_MASK_HEAD_REGISTRY.register()
class CoarseMaskHead(nn.Module):
    """Conv + FC coarse mask predictor at 7x7 (reference coarse_mask_head.py)."""

    num_classes: int
    conv_dim: int = 256
    fc_dim: int = 1024
    num_fc: int = 2
    output_side_resolution: int = 7
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: ShapeSpec):
        mh = cfg.MODEL.ROI_MASK_HEAD
        return dict(
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            fc_dim=mh.FC_DIM,
            num_fc=int(mh.NUM_FC),
            output_side_resolution=mh.OUTPUT_SIDE_RESOLUTION
            if "OUTPUT_SIDE_RESOLUTION" in mh
            else 7,
            dtype=jnp.bfloat16
            if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
            else jnp.float32,
        )

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from jtsm_tpu.layers import Conv2d

        x = Conv2d(
            features=self.conv_dim,
            kernel_size=2,
            padding=0,
            activation=nn.relu,
            dtype=self.dtype,
            name="reduce_spatial_dim_conv",
            stride=2,
        )(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = Linear(features=self.fc_dim, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        s = self.output_side_resolution
        x = Linear(
            features=self.num_classes * s * s,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="prediction",
        )(x)
        return x.reshape(-1, s, s, self.num_classes).astype(jnp.float32)


@ROI_MASK_HEAD_REGISTRY.register()
class PointRendMaskHead(CoarseMaskHead):
    """Reference name (projects/PointRend/point_rend/mask_head.py:133).

    In the reference the point-subdivision refinement lives inside this mask
    head; in this redesign it lives in :class:`PointRendROIHeads` (which
    needs the image-level features the pooled-head interface doesn't carry),
    so the registered head is the coarse predictor and declares the coupled
    ROI-heads implementation; reference yamls — which leave ROI_HEADS.NAME
    at StandardROIHeads — then build the full subdivision model verbatim."""

    ROI_HEADS_OVERRIDE = "PointRendROIHeads"


@ROI_HEADS_REGISTRY.register()
class PointRendROIHeads(StandardROIHeads):
    """StandardROIHeads with the mask branch replaced by coarse+point heads."""

    train_num_points: int = 196
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 5
    subdivision_num_points: int = 784
    point_fc_dim: int = 256
    point_num_fc: int = 3

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = StandardROIHeads.from_config(cfg, input_shape)
        if cfg.MODEL.MASK_ON:
            # honor NAME (CoarseMaskHead or the reference's PointRendMaskHead
            # alias) and the FC_DIM/NUM_FC/OUTPUT_SIDE_RESOLUTION knobs
            head_cls = ROI_MASK_HEAD_REGISTRY.get(cfg.MODEL.ROI_MASK_HEAD.NAME)
            if not issubclass(head_cls, CoarseMaskHead):
                head_cls = CoarseMaskHead
            ret["mask_head"] = head_cls(**head_cls.from_config(cfg, None))
            ret["mask_size"] = 28
        if "POINT_HEAD" in cfg.MODEL:
            ret.update(
                train_num_points=cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS,
                oversample_ratio=cfg.MODEL.POINT_HEAD.OVERSAMPLE_RATIO,
                importance_sample_ratio=cfg.MODEL.POINT_HEAD.IMPORTANCE_SAMPLE_RATIO,
                subdivision_steps=cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS,
                subdivision_num_points=cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS,
                point_fc_dim=cfg.MODEL.POINT_HEAD.FC_DIM,
                point_num_fc=cfg.MODEL.POINT_HEAD.NUM_FC,
            )
        return ret

    def _point_head(self):
        return StandardPointHead(
            num_classes=self.num_classes,
            fc_dim=self.point_fc_dim,
            num_fc=self.point_num_fc,
            name="point_head",
        )

    def _fine_grained_features(self, features, boxes_norm, point_coords, b, n_per_img):
        """Sample p2 features at absolute point locations."""
        p2 = features[self.mask_in_features[0]]  # (B, H, W, C)
        # point_coords are within-box [0,1]; convert to image-normalized
        x0, y0, x1, y1 = (boxes_norm[:, i] for i in range(4))
        px = x0[:, None] + point_coords[..., 0] * (x1 - x0)[:, None]
        py = y0[:, None] + point_coords[..., 1] * (y1 - y0)[:, None]
        abs_pts = jnp.stack([px, py], axis=-1)  # (N, P, 2) normalized [0,1]
        img_idx = jnp.repeat(jnp.arange(b), n_per_img)
        per_img_feats = p2[img_idx]  # (N, H, W, C)
        return point_sample(per_img_feats, abs_pts)

    def _forward_mask_train(self, feats_list, sampled, targets, b):
        """Coarse mask loss + point loss at uncertain points."""
        s = self.batch_size_per_image
        sm = min(self.mask_fg_capacity, s)
        fg = sampled["fg"]
        rng = self.make_rng("sampling")

        def pick(rng_i, fg_i):
            u = jax.random.uniform(rng_i, (s,))
            pri = jnp.where(fg_i, 1.0 + u, -jnp.inf)
            v, idx = jax.lax.top_k(pri, sm)
            return idx, jnp.isfinite(v)

        rngs = jax.random.split(rng, b)
        mask_idx, mask_valid = jax.vmap(pick)(rngs, fg)
        mask_boxes = jnp.take_along_axis(sampled["boxes"], mask_idx[..., None], axis=1)
        mask_classes = jnp.take_along_axis(sampled["gt_classes"], mask_idx, axis=1)
        matched = jnp.take_along_axis(sampled["matched_idx"], mask_idx, axis=1)

        flat_boxes = mask_boxes.reshape(b * sm, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), sm)
        pooled = self.mask_pooler(feats_list, flat_boxes, batch_idx, rois_per_image=sm)
        coarse = self.mask_head(pooled)  # (N, 7, 7, K)

        # coarse loss vs downsampled targets
        cs = coarse.shape[1]
        coarse_targets = jax.vmap(
            lambda crops, gtb, mi, pb: mask_targets_from_crops(crops, gtb, mi, pb, cs)
        )(targets["gt_mask_crops"], targets["gt_boxes"], matched, mask_boxes)
        flat_cls = mask_classes.reshape(-1)
        sel = jnp.take_along_axis(
            coarse, jnp.clip(flat_cls, 0, self.num_classes - 1)[:, None, None, None], axis=-1
        )[..., 0]
        per_px = binary_cross_entropy_with_logits(
            sel, (coarse_targets.reshape(-1, cs, cs) >= 0.5).astype(jnp.float32)
        ).mean(axis=(1, 2))
        fg_f = mask_valid.reshape(-1).astype(jnp.float32)
        loss_coarse = jnp.sum(per_px * fg_f) / jnp.maximum(fg_f.sum(), 1.0)

        # point loss
        rng2 = self.make_rng("sampling")
        point_coords = get_uncertain_point_coords_with_randomness(
            rng2,
            coarse,
            flat_cls,
            self.train_num_points,
            self.oversample_ratio,
            self.importance_sample_ratio,
        )  # (N, P, 2) within-box
        coarse_at_pts = point_sample(coarse, point_coords)  # (N, P, K)
        # targets at points from 28x28 crops
        tgt28 = jax.vmap(
            lambda crops, gtb, mi, pb: mask_targets_from_crops(crops, gtb, mi, pb, 28)
        )(targets["gt_mask_crops"], targets["gt_boxes"], matched, mask_boxes)
        tgt_at_pts = point_sample(
            tgt28.reshape(-1, 28, 28)[..., None].astype(jnp.float32), point_coords
        )[..., 0]

        # normalized box coords for fine features: boxes / image size
        h = feats_list[0].shape[1] * 4  # p2 stride 4
        w = feats_list[0].shape[2] * 4
        boxes_norm = flat_boxes / jnp.asarray([w, h, w, h], jnp.float32)
        fine = self._fine_grained_features(
            {self.mask_in_features[0]: feats_list[0]}, boxes_norm, point_coords, b, sm
        )
        point_logits = self._point_head()(fine, coarse_at_pts)
        sel_pts = jnp.take_along_axis(
            point_logits,
            jnp.clip(flat_cls, 0, self.num_classes - 1)[:, None, None],
            axis=2,
        )[..., 0]
        pt_loss = binary_cross_entropy_with_logits(
            sel_pts, (tgt_at_pts >= 0.5).astype(jnp.float32)
        ).mean(axis=1)
        loss_point = jnp.sum(pt_loss * fg_f) / jnp.maximum(fg_f.sum(), 1.0)
        return {"loss_mask": loss_coarse, "loss_mask_point": loss_point}

    def _forward_mask_inference(self, features, detections, b):
        """Iterative subdivision: upsample coarse logits x2 per step, re-run
        the point head on the most uncertain points, scatter back
        (reference roi_heads.py _subdivision_inference)."""
        d = detections["boxes"].shape[1]
        det_boxes = detections["boxes"].reshape(b * d, 4)
        det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        mfeats = [features[f] for f in self.mask_in_features]
        pooled = self.mask_pooler(mfeats, det_boxes, det_batch, rois_per_image=d)
        coarse = self.mask_head(pooled)  # (N, 7, 7, K)
        classes = detections["classes"].reshape(-1)
        n = coarse.shape[0]

        p2 = features[self.mask_in_features[0]]
        h = p2.shape[1] * 4
        w = p2.shape[2] * 4
        boxes_norm = det_boxes / jnp.asarray([w, h, w, h], jnp.float32)

        logits = coarse
        point_head = self._point_head()
        for _ in range(self.subdivision_steps):
            s = logits.shape[1]
            logits = interpolate_bilinear(logits, (s * 2, s * 2), align_corners=False)
            s2 = s * 2
            uncert = calculate_uncertainty(
                logits.reshape(n, s2 * s2, -1), classes
            ).reshape(n, s2, s2)
            num_pts = min(self.subdivision_num_points, s2 * s2)
            idx, coords = get_uncertain_point_coords_on_grid(uncert, num_pts)
            coarse_at = point_sample(logits, coords)
            fine = self._fine_grained_features(
                {self.mask_in_features[0]: p2}, boxes_norm, coords, b, d
            )
            refined = point_head(fine, coarse_at)  # (N, P, K)
            flat = logits.reshape(n, s2 * s2, -1)
            flat = jax.vmap(lambda f, i, r: f.at[i].set(r))(flat, idx, refined)
            logits = flat.reshape(n, s2, s2, -1)

        k = logits.shape[-1]
        sel = jnp.take_along_axis(
            logits, jnp.clip(classes, 0, k - 1)[:, None, None, None], axis=-1
        )[..., 0]
        probs = jax.nn.sigmoid(sel)
        detections["masks"] = probs.reshape(b, d, probs.shape[-2], probs.shape[-1])
        return detections

"""DensePose heads (reference: projects/DensePose/densepose/modeling —
``DensePoseV1ConvXHead`` chart predictor: coarse segmentation (2ch), patch
index classification (24+1), and per-patch U/V regression)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Conv2d, ConvTranspose2d, ShapeSpec
from jtsm_tpu.modeling.poolers import ROIPooler
from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY, StandardROIHeads
from jtsm_tpu.ops.losses import softmax_cross_entropy

Array = jax.Array


class DensePoseV1ConvXHead(nn.Module):
    num_stacked_convs: int = 8
    conv_dim: int = 512
    kernel: int = 3
    num_patches: int = 24
    num_coarse_segm: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        for i in range(self.num_stacked_convs):
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                activation=nn.relu,
                dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
        up = ConvTranspose2d(
            features=self.conv_dim, kernel_size=4, stride=2, dtype=self.dtype, name="deconv"
        )(x)
        up = nn.relu(up)

        def predictor(ch, name):
            return Conv2d(
                features=ch,
                kernel_size=1,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.001),
                name=name,
            )(up).astype(jnp.float32)

        return {
            "coarse_segm": predictor(self.num_coarse_segm, "ann_index_lowres"),
            "fine_segm": predictor(self.num_patches + 1, "index_uv_lowres"),
            "u": predictor(self.num_patches + 1, "u_lowres"),
            "v": predictor(self.num_patches + 1, "v_lowres"),
        }


@ROI_HEADS_REGISTRY.register()
class DensePoseROIHeads(StandardROIHeads):
    """StandardROIHeads + a densepose branch on person ROIs."""

    densepose_pooler: Optional[ROIPooler] = None
    densepose_head: Optional[nn.Module] = None
    index_weight: float = 5.0
    part_weight: float = 1.0
    uv_weight: float = 0.01
    dp_fg_capacity: int = 32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = StandardROIHeads.from_config(cfg, input_shape)
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        ret.update(
            densepose_pooler=ROIPooler(
                output_size=dp.POOLER_RESOLUTION,
                scales=tuple(1.0 / input_shape[f].stride for f in in_features),
                sampling_ratio=dp.POOLER_SAMPLING_RATIO,
                pooler_type=dp.POOLER_TYPE,
            ),
            densepose_head=DensePoseV1ConvXHead(
                num_stacked_convs=dp.NUM_STACKED_CONVS,
                conv_dim=dp.CONV_HEAD_DIM,
                kernel=dp.CONV_HEAD_KERNEL,
                num_patches=dp.NUM_PATCHES,
                num_coarse_segm=dp.NUM_COARSE_SEGM_CHANNELS,
            ),
            index_weight=dp.INDEX_WEIGHTS,
            part_weight=dp.PART_WEIGHTS,
            uv_weight=dp.POINT_REGRESSION_WEIGHTS,
            dp_fg_capacity=dp.FG_CAPACITY,
        )
        return ret

    def _forward_extra_train(self, features, sampled, targets, b):
        """DensePose branch on fg rois (reference densepose/roi_head.py
        ``DensePoseROIHeads._forward_densepose``). Static shape: up to
        ``dp_fg_capacity`` fg rois per image; per-roi point targets come from
        the matched gt's dp annotations, re-normalized from gt-box space to
        the roi box space."""
        if self.densepose_head is None or "gt_dp_coords" not in targets:
            return {}
        s = self.batch_size_per_image
        sm = min(self.dp_fg_capacity, s)
        fg = sampled["fg"]  # (B, S)
        rng = self.make_rng("sampling")

        def pick(rng_i, fg_i):
            u = jax.random.uniform(rng_i, (s,))
            pri = jnp.where(fg_i, 1.0 + u, -jnp.inf)
            v, idx = jax.lax.top_k(pri, sm)
            return idx, jnp.isfinite(v)

        idx, roi_valid = jax.vmap(pick)(jax.random.split(rng, b), fg)  # (B, Sm)
        roi_boxes = jnp.take_along_axis(sampled["boxes"], idx[..., None], axis=1)
        matched = jnp.take_along_axis(sampled["matched_idx"], idx, axis=1)  # (B, Sm)
        matched = jnp.clip(matched, 0, targets["gt_boxes"].shape[1] - 1)

        def gather_gt(t, extra_dims):
            mi = matched.reshape(b, sm, *([1] * extra_dims))
            return jnp.take_along_axis(
                t, jnp.broadcast_to(mi, (b, sm) + t.shape[2:]), axis=1
            )

        gt_boxes = gather_gt(targets["gt_boxes"], 1)  # (B, Sm, 4)
        coords = gather_gt(targets["gt_dp_coords"], 2)  # (B, Sm, P, 2)
        patch = gather_gt(targets["gt_dp_patch"], 1)  # (B, Sm, P)
        uu = gather_gt(targets["gt_dp_u"], 1)
        vv = gather_gt(targets["gt_dp_v"], 1)
        pt_valid = gather_gt(targets["gt_dp_valid"], 1)

        # gt-box-normalized -> absolute -> roi-box-normalized point coords
        gx0, gy0 = gt_boxes[..., 0:1], gt_boxes[..., 1:2]
        gw = jnp.maximum(gt_boxes[..., 2:3] - gx0, 1e-4)
        gh = jnp.maximum(gt_boxes[..., 3:4] - gy0, 1e-4)
        ax = gx0 + coords[..., 0] * gw
        ay = gy0 + coords[..., 1] * gh
        px0, py0 = roi_boxes[..., 0:1], roi_boxes[..., 1:2]
        pw = jnp.maximum(roi_boxes[..., 2:3] - px0, 1e-4)
        ph = jnp.maximum(roi_boxes[..., 3:4] - py0, 1e-4)
        rx = (ax - px0) / pw
        ry = (ay - py0) / ph
        inside = (rx >= 0) & (rx <= 1) & (ry >= 0) & (ry <= 1)
        pt_coords = jnp.stack([rx, ry], axis=-1)

        p = coords.shape[2]
        flat_boxes = roi_boxes.reshape(b * sm, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), sm)
        feats = [features[f] for f in self.box_in_features]
        pooled = self.densepose_pooler(feats, flat_boxes, batch_idx)
        outputs = self.densepose_head(pooled)
        return self.densepose_losses(
            outputs,
            {
                "pt_coords": pt_coords.reshape(b * sm, p, 2),
                "pt_patch": patch.reshape(b * sm, p),
                "pt_u": uu.reshape(b * sm, p),
                "pt_v": vv.reshape(b * sm, p),
                "pt_valid": (pt_valid & inside).reshape(b * sm, p),
            },
            roi_valid.reshape(-1).astype(jnp.float32),
        )

    def _forward_extra_inference(self, features, detections, b):
        """Attach per-detection chart maps: patch argmax (masked by the
        coarse fg segmentation) and the U/V values at the argmax patch
        channel — the inputs DensePoseCOCOEvaluator samples at gt points."""
        if self.densepose_head is None:
            return detections
        d = detections["boxes"].shape[1]
        det_boxes = detections["boxes"].reshape(b * d, 4)
        det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        feats = [features[f] for f in self.box_in_features]
        pooled = self.densepose_pooler(feats, det_boxes, det_batch)
        out = self.densepose_head(pooled)
        fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0  # (N, S, S)
        patch = jnp.argmax(out["fine_segm"], axis=-1) * fg  # (N, S, S)
        u_at = jnp.take_along_axis(out["u"], patch[..., None], axis=-1)[..., 0]
        v_at = jnp.take_along_axis(out["v"], patch[..., None], axis=-1)[..., 0]
        ss = patch.shape[-1]
        detections["dp_patch"] = patch.reshape(b, d, ss, ss).astype(jnp.int32)
        detections["dp_u"] = u_at.reshape(b, d, ss, ss)
        detections["dp_v"] = v_at.reshape(b, d, ss, ss)
        return detections

    def densepose_losses(self, outputs: Dict[str, Array], targets: Dict[str, Array], valid: Array):
        """Chart losses at annotated points: coarse-segm CE, patch CE, U/V
        smooth-L1 at gt patch channels. Targets (per roi): pt_coords (P, 2)
        normalized, pt_patch (P,), pt_u/pt_v (P,), pt_valid (P,)."""
        import sys

        sys.path.insert(0, "projects/PointRend")
        from point_rend.point_features import point_sample

        fine = outputs["fine_segm"]  # (N, S, S, 25)
        pts = targets["pt_coords"]
        logits_at = point_sample(fine, pts)  # (N, P, 25)
        patch = targets["pt_patch"].astype(jnp.int32)
        w = targets["pt_valid"].astype(jnp.float32) * valid[:, None]
        ce = softmax_cross_entropy(logits_at, patch)
        loss_index = jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)

        u_at = point_sample(outputs["u"], pts)
        v_at = point_sample(outputs["v"], pts)
        u_sel = jnp.take_along_axis(u_at, patch[..., None], axis=2)[..., 0]
        v_sel = jnp.take_along_axis(v_at, patch[..., None], axis=2)[..., 0]
        loss_u = jnp.sum(jnp.abs(u_sel - targets["pt_u"]) * w) / jnp.maximum(w.sum(), 1.0)
        loss_v = jnp.sum(jnp.abs(v_sel - targets["pt_v"]) * w) / jnp.maximum(w.sum(), 1.0)
        return {
            "loss_densepose_I": loss_index * self.index_weight,
            "loss_densepose_U": loss_u * self.uv_weight,
            "loss_densepose_V": loss_v * self.uv_weight,
        }

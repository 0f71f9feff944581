"""DensePose ROI heads (reference:
projects/DensePose/densepose/modeling/roi_heads/roi_head.py
``DensePoseROIHeads`` + modeling/build.py build_densepose_{head,predictor,
losses} + modeling/filter.py ``DensePoseDataFilter``).

Architecture (mirrors the reference's three-registry split):
  pooled ROI features -> head body (ROI_DENSEPOSE_HEAD_REGISTRY)
                      -> predictor (DENSEPOSE_PREDICTOR_REGISTRY)
                      -> loss (DENSEPOSE_LOSS_REGISTRY)
TPU design: the densepose branch runs on a fixed-capacity set of foreground
ROIs per image (``FG_CAPACITY``); the data filter is folded into the ROI
pick — ROIs whose matched GT carries densepose points are prioritized
(the reference's DensePoseDataFilter drops un-annotated proposals).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Conv2d, ConvTranspose2d, ShapeSpec
from jtsm_tpu.modeling.poolers import ROIPooler
from jtsm_tpu.modeling.roi_heads.roi_heads import ROI_HEADS_REGISTRY, StandardROIHeads

from .modeling.heads import (
    ROI_DENSEPOSE_HEAD_REGISTRY,
    build_densepose_head,
)
from .modeling.losses import build_densepose_losses
from .modeling.predictors import (
    DENSEPOSE_PREDICTOR_REGISTRY,
    DensePoseChartPredictor,
    build_densepose_predictor,
)

Array = jax.Array


class DensePoseV1ConvXHead(nn.Module):
    """Back-compat combined head+predictor (the original single-module
    form): stacked convs -> deconv -> chart outputs. Prefer the registry
    pair (heads.DensePoseV1ConvXHead + DensePoseChartPredictor)."""

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
        predictor = DensePoseChartPredictor(
            num_patches=self.num_patches,
            num_coarse_segm=self.num_coarse_segm,
            up_scale=1,
            dtype=self.dtype,
            name="predictor",
        )
        return predictor(x)


@ROI_HEADS_REGISTRY.register()
class DensePoseROIHeads(StandardROIHeads):
    """StandardROIHeads + a densepose branch on person ROIs."""

    densepose_pooler: Optional[ROIPooler] = None
    densepose_head: Optional[nn.Module] = None
    densepose_predictor: Optional[nn.Module] = None
    densepose_embedder: Optional[nn.Module] = None
    densepose_loss: Optional[Any] = None
    dp_fg_capacity: int = 32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        ret = StandardROIHeads.from_config(cfg, input_shape)
        if not cfg.MODEL.DENSEPOSE_ON:
            return ret
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        in_features = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        ret.update(
            densepose_pooler=ROIPooler(
                output_size=dp.POOLER_RESOLUTION,
                scales=tuple(1.0 / input_shape[f].stride for f in in_features),
                sampling_ratio=dp.POOLER_SAMPLING_RATIO,
                pooler_type=dp.POOLER_TYPE,
            ),
            densepose_head=build_densepose_head(cfg, dtype),
            densepose_predictor=build_densepose_predictor(cfg, dtype),
            densepose_loss=build_densepose_losses(cfg),
            dp_fg_capacity=dp.FG_CAPACITY,
        )
        if dp.PREDICTOR_NAME == "DensePoseEmbeddingPredictor" and len(
            dp.CSE.EMBEDDERS
        ):
            from .modeling.cse import Embedder, MeshCatalog

            MeshCatalog.register_meshes(dp.CSE.EMBEDDERS.keys())
            ret["densepose_embedder"] = Embedder(**Embedder.from_config(cfg))
        return ret

    def _forward_extra_train(self, features, sampled, targets, b):
        """DensePose branch on fg rois. Static shape: up to
        ``dp_fg_capacity`` fg rois per image; per-roi point targets come from
        the matched gt's dp annotations, re-normalized from gt-box space to
        the roi box space. ROIs matched to dp-annotated GT are prioritized
        (DensePoseDataFilter semantics, reference modeling/filter.py)."""
        if self.densepose_head is None or "gt_dp_coords" not in targets:
            return {}
        s = self.batch_size_per_image
        sm = min(self.dp_fg_capacity, s)
        fg = sampled["fg"]  # (B, S)
        rng = self.make_rng("sampling")

        # does the matched gt carry any valid densepose point?
        g = targets["gt_dp_valid"].shape[1]
        matched_all = jnp.clip(sampled["matched_idx"], 0, g - 1)  # (B, S)
        gt_has_dp = targets["gt_dp_valid"].any(axis=-1)  # (B, G)
        roi_has_dp = jnp.take_along_axis(gt_has_dp, matched_all, axis=1)  # (B, S)

        def pick(rng_i, fg_i, dp_i):
            u = jax.random.uniform(rng_i, (s,))
            pri = jnp.where(fg_i & dp_i, 2.0 + u, jnp.where(fg_i, 1.0 + u, -jnp.inf))
            v, idx = jax.lax.top_k(pri, sm)
            return idx, v >= 2.0  # only dp-annotated rois contribute loss

        idx, roi_valid = jax.vmap(pick)(
            jax.random.split(rng, b), fg, roi_has_dp
        )  # (B, Sm)
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
        # chart annotations (absent for CSE datasets, which carry vertex ids)
        zeros_p = jnp.zeros(coords.shape[:3], jnp.float32)
        patch = (
            gather_gt(targets["gt_dp_patch"], 1)
            if "gt_dp_patch" in targets
            else zeros_p.astype(jnp.int32)
        )
        uu = gather_gt(targets["gt_dp_u"], 1) if "gt_dp_u" in targets else zeros_p
        vv = gather_gt(targets["gt_dp_v"], 1) if "gt_dp_v" in targets else zeros_p
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
        pooled = self.densepose_pooler(feats, flat_boxes, batch_idx, rois_per_image=sm)
        head_feats = self.densepose_head(pooled, train=True)
        outputs = self.densepose_predictor(head_feats)
        loss_targets = {
            "pt_coords": pt_coords.reshape(b * sm, p, 2),
            "pt_patch": patch.reshape(b * sm, p),
            "pt_u": uu.reshape(b * sm, p),
            "pt_v": vv.reshape(b * sm, p),
            "pt_valid": (pt_valid & inside).reshape(b * sm, p),
        }
        flat_valid = roi_valid.reshape(-1).astype(jnp.float32)
        if self.densepose_embedder is not None:
            # CSE: per-point gt vertex ids + per-roi mesh ids
            if "gt_dp_vertex" in targets:
                loss_targets["pt_vertex"] = gather_gt(
                    targets["gt_dp_vertex"], 1
                ).reshape(b * sm, p)
            if "gt_dp_mesh" in targets:
                loss_targets["pt_mesh"] = gather_gt(
                    targets["gt_dp_mesh"][..., None], 1
                ).reshape(b * sm)
            else:
                loss_targets["pt_mesh"] = jnp.zeros((b * sm,), jnp.int32)
            return self.densepose_loss(
                outputs, loss_targets, flat_valid, embeddings=self.densepose_embedder()
            )
        return self.densepose_loss(outputs, loss_targets, flat_valid)

    def _forward_extra_inference(self, features, detections, b):
        """Attach per-detection chart maps: patch argmax (masked by the
        coarse fg segmentation) and the U/V values at the argmax patch
        channel — the inputs DensePoseCOCOEvaluator samples at gt points.
        With confidence predictors the sigma map rides along too."""
        if self.densepose_head is None:
            return detections
        d = detections["boxes"].shape[1]
        det_boxes = detections["boxes"].reshape(b * d, 4)
        det_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        feats = [features[f] for f in self.box_in_features]
        pooled = self.densepose_pooler(feats, det_boxes, det_batch, rois_per_image=d)
        head_feats = self.densepose_head(pooled, train=False)
        out = self.densepose_predictor(head_feats)
        if "fine_segm" not in out:
            # CSE predictor: attach per-detection embedding + fg maps
            ss = out["embedding"].shape[1]
            fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0
            detections["dp_embedding"] = out["embedding"].reshape(
                b, d, ss, ss, -1
            )
            detections["dp_fg"] = fg.reshape(b, d, ss, ss)
            return detections
        fg = jnp.argmax(out["coarse_segm"], axis=-1) > 0  # (N, S, S)
        patch = jnp.argmax(out["fine_segm"], axis=-1) * fg  # (N, S, S)
        u_at = jnp.take_along_axis(out["u"], patch[..., None], axis=-1)[..., 0]
        v_at = jnp.take_along_axis(out["v"], patch[..., None], axis=-1)[..., 0]
        ss = patch.shape[-1]
        detections["dp_patch"] = patch.reshape(b, d, ss, ss).astype(jnp.int32)
        detections["dp_u"] = u_at.reshape(b, d, ss, ss)
        detections["dp_v"] = v_at.reshape(b, d, ss, ss)
        if "sigma_2" in out:
            sig = jnp.take_along_axis(out["sigma_2"], patch[..., None], axis=-1)[..., 0]
            detections["dp_sigma"] = sig.reshape(b, d, ss, ss)
        return detections

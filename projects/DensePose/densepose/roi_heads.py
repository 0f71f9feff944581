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
        )
        return ret

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

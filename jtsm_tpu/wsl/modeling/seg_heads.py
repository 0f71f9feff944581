"""WSJDS segmentation heads (reference:
projects/WSL/wsl/modeling/seg_heads/seg_heads.py:79 ``ASPPHead`` (+ optional
dense-CRF post-processing :173), :232 ``TwoClassHead`` — the degenerate
FG/BG head used by the JTSM VOC config; wsjds_heads.py:36 ``WSJDSROIHeads``
joint det+seg via CPG maps)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ASPP, Conv2d, ShapeSpec, interpolate_bilinear
from ...modeling.meta_arch.semantic_seg import SEM_SEG_HEADS_REGISTRY
from ...ops.losses import softmax_cross_entropy
from ..ops import crf_mean_field

Array = jax.Array


@SEM_SEG_HEADS_REGISTRY.register()
class ASPPHead(nn.Module):
    """ASPP semantic head with optional CRF refinement at eval
    (reference seg_heads.py:79)."""

    in_features: Sequence[str]
    num_classes: int
    convs_dim: int = 256
    common_stride: int = 8
    norm: str = ""
    loss_weight: float = 1.0
    ignore_value: int = 255
    use_crf: bool = False
    # reference seg_heads.py:89,126: True -> (num_classes + 1)-channel
    # softmax CE; False (default) -> per-class weighted BCE on binary
    # targets (the WSJDS det->seg supervision)
    mask_softmax: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        return dict(
            in_features=in_features,
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            convs_dim=cfg.MODEL.SEM_SEG_HEAD.ASSP_CONVS_DIM
            if "ASSP_CONVS_DIM" in cfg.MODEL.SEM_SEG_HEAD
            else cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM,
            common_stride=input_shape[in_features[0]].stride,
            norm=cfg.MODEL.SEM_SEG_HEAD.NORM,
            loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            use_crf=bool(cfg.MODEL.SEM_SEG_HEAD.get("CONSTRAINT", "") == "CRF"),
            mask_softmax=bool(cfg.MODEL.SEM_SEG_HEAD.get("MASK_SOFTMAX", False)),
            dtype=dtype,
        )

    def _crf(self, logits: Array, images: Array) -> Array:
        """Dense-CRF refined probabilities at the logits' resolution
        (reference seg_heads.py:173 ``crf``: pydensecrf on CPU; here the
        jittable mean-field in wsl/ops)."""
        probs = jax.nn.softmax(logits, axis=-1)
        img_small = interpolate_bilinear(
            images.astype(jnp.float32), (logits.shape[1], logits.shape[2])
        )
        return jax.vmap(crf_mean_field)(probs, img_small)

    @nn.compact
    def __call__(
        self,
        features,
        targets=None,
        train: bool = False,
        targets_stride: int = 1,
        images=None,
        binary_targets=None,  # (B, C, Ht, Wt) per-class 0/1 maps
        binary_weights=None,  # (B, C, Ht, Wt) balanced fg/bg weights
    ):
        x = features[self.in_features[-1]]
        x = ASPP(
            in_channels=x.shape[-1],
            out_channels=self.convs_dim,
            norm=self.norm,
            dtype=self.dtype,
            name="aspp",
        )(x, deterministic=not train)
        out_channels = self.num_classes + (1 if self.mask_softmax else 0)
        logits = Conv2d(
            features=out_channels,
            kernel_size=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x).astype(jnp.float32)

        losses = {}
        if train and binary_targets is not None:
            losses["loss_sem_seg"] = self._binary_loss(
                logits, binary_targets, binary_weights
            )
        elif train and targets is not None:
            assert self.common_stride % targets_stride == 0
            s = self.common_stride // targets_stride
            t = targets[:, ::s, ::s][:, : logits.shape[1], : logits.shape[2]]
            valid = (t != self.ignore_value) & (t >= 0)
            ce = softmax_cross_entropy(logits, jnp.clip(t, 0, self.num_classes - 1))
            losses["loss_sem_seg"] = (
                jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0) * self.loss_weight
            )
            if self.use_crf and images is not None:
                # constraint loss (reference seg_heads.py:140-147): KL from
                # the CRF-refined distribution (a fixed target — pydensecrf
                # runs outside the graph in the reference) to the predicted
                # one
                q = jax.lax.stop_gradient(self._crf(logits, images))
                log_p = jax.nn.log_softmax(logits, axis=-1)
                kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-8)) - log_p), axis=-1)
                losses["loss_constraint"] = kl.mean() * self.loss_weight
        elif not train and self.use_crf and images is not None:
            # eval-time refinement (reference seg_heads.py:150-162)
            logits = jnp.log(jnp.clip(self._crf(logits, images), 1e-8))
        return logits, losses

    def _binary_loss(self, logits, binary_targets, binary_weights):
        """WSJDS det->seg supervision (reference seg_heads.py:126-138):
        MASK_SOFTMAX off -> per-class weighted BCE-with-logits (sum, weights
        already balanced per class); on -> (num_classes + 1)-way softmax CE
        with the extra background channel, target = argmax class or bg when
        no class is positive, ignore where every class weight is 0. Targets
        arrive at an arbitrary resolution (CPG/image res in the reference);
        they are stride-subsampled to the logits grid and the balanced
        weights renormalized at that resolution."""
        h, w = logits.shape[1], logits.shape[2]
        bt = jnp.transpose(binary_targets, (0, 2, 3, 1))  # (B, Ht, Wt, C)
        bw = jnp.transpose(binary_weights, (0, 2, 3, 1))
        sy = max(bt.shape[1] // h, 1)
        sx = max(bt.shape[2] // w, 1)
        bt = bt[:, ::sy, ::sx][:, :h, :w]
        bw = bw[:, ::sy, ::sx][:, :h, :w]
        pos = (bt > 0.5) & (bw > 0)
        neg = (bt <= 0.5) & (bw > 0)
        # re-balance fg/bg at the subsampled resolution (the incoming
        # weights were normalized by full-res pixel counts)
        n_pos = jnp.maximum(pos.sum(axis=(1, 2), keepdims=True), 1.0)
        n_neg = jnp.maximum(neg.sum(axis=(1, 2), keepdims=True), 1.0)
        wgt = jnp.where(pos, 1.0 / n_pos, jnp.where(neg, 1.0 / n_neg, 0.0))
        if self.mask_softmax:
            any_pos = pos.any(axis=-1)
            cls = jnp.where(any_pos, jnp.argmax(bt * wgt, axis=-1), self.num_classes)
            valid = (bw > 0).any(axis=-1)
            ce = softmax_cross_entropy(logits, cls)
            return (
                jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0) * self.loss_weight
            )
        t = bt.astype(jnp.float32)
        lg = logits
        bce = jnp.maximum(lg, 0.0) - lg * t + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        return jnp.sum(bce * wgt) * self.loss_weight


@SEM_SEG_HEADS_REGISTRY.register()
class TwoClassHead(nn.Module):
    """Degenerate 2-class FG/BG 'head': constant logits, no parameters or
    loss (reference seg_heads.py:232 — the JTSM VOC config uses it so the
    panoptic fusion has a stuff map where everything non-thing is
    background)."""

    num_classes: int = 2
    common_stride: int = 8

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        in_features = tuple(cfg.MODEL.SEM_SEG_HEAD.IN_FEATURES)
        return dict(
            num_classes=2,
            common_stride=input_shape[in_features[0]].stride
            if in_features[0] in input_shape
            else 8,
        )

    @nn.compact
    def __call__(self, features, targets=None, train: bool = False, targets_stride: int = 1):
        f = list(features.values())[0]
        b, h, w = f.shape[0], f.shape[1], f.shape[2]
        logits = jnp.zeros((b, h, w, 2), jnp.float32).at[..., 1].set(1.0)
        return logits, {}

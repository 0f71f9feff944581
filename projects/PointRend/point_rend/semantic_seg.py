"""PointRend semantic segmentation head (reference:
projects/PointRend/point_rend/semantic_seg.py:36 ``PointRendSemSegHead``).

A coarse sem-seg head (``POINT_HEAD.COARSE_SEM_SEG_HEAD_NAME``, typically
``SemSegFPNHead``) plus a point head refining the most uncertain locations:
- train: CE on ``TRAIN_NUM_POINTS`` importance-sampled points (uncertainty =
  top1-top2 logit gap, reference :19);
- inference: ``SUBDIVISION_STEPS`` rounds of 2x bilinear upsample, then the
  ``SUBDIVISION_NUM_POINTS`` most uncertain grid cells are re-predicted by
  the point head and scattered back — a static-shape top-k + scatter, which
  XLA maps to efficient TPU gathers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ShapeSpec, interpolate_bilinear
from jtsm_tpu.modeling.meta_arch.semantic_seg import (
    SEM_SEG_HEADS_REGISTRY,
    build_sem_seg_head,
)
from jtsm_tpu.ops.losses import softmax_cross_entropy

from .point_features import (
    calculate_uncertainty_sem_seg,
    get_uncertain_point_coords_on_grid,
    get_uncertain_point_coords_with_randomness,
    point_sample,
)
from .point_head import StandardPointHead

Array = jax.Array


def point_sample_nearest_int(labels: Array, point_coords: Array) -> Array:
    """Nearest-neighbor sample of an int label map.

    labels (N, H, W) int; point_coords (N, P, 2) in [0,1] -> (N, P) int.
    """
    n, h, w = labels.shape

    def one(lab, pts):
        xs = jnp.clip((pts[:, 0] * w).astype(jnp.int32), 0, w - 1)
        ys = jnp.clip((pts[:, 1] * h).astype(jnp.int32), 0, h - 1)
        return lab[ys, xs]

    return jax.vmap(one)(labels, point_coords)


@SEM_SEG_HEADS_REGISTRY.register()
class PointRendSemSegHead(nn.Module):
    coarse_head: nn.Module
    point_head: nn.Module
    in_features: Sequence[str]
    num_classes: int
    train_num_points: int = 1024
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8192
    ignore_value: int = 255
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        assert (
            cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES == cfg.MODEL.POINT_HEAD.NUM_CLASSES
        )
        sub = cfg.clone()
        sub.defrost()
        sub.MODEL.SEM_SEG_HEAD.NAME = cfg.MODEL.POINT_HEAD.COARSE_SEM_SEG_HEAD_NAME
        coarse_head = build_sem_seg_head(sub, input_shape)
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        point_head = StandardPointHead(
            num_classes=cfg.MODEL.POINT_HEAD.NUM_CLASSES,
            fc_dim=cfg.MODEL.POINT_HEAD.FC_DIM,
            num_fc=cfg.MODEL.POINT_HEAD.NUM_FC,
            coarse_pred_each_layer=cfg.MODEL.POINT_HEAD.COARSE_PRED_EACH_LAYER,
            cls_agnostic=False,
            dtype=dtype,
        )
        return dict(
            coarse_head=coarse_head,
            point_head=point_head,
            in_features=tuple(cfg.MODEL.POINT_HEAD.IN_FEATURES),
            num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            train_num_points=cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS,
            oversample_ratio=cfg.MODEL.POINT_HEAD.OVERSAMPLE_RATIO,
            importance_sample_ratio=cfg.MODEL.POINT_HEAD.IMPORTANCE_SAMPLE_RATIO,
            subdivision_steps=cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS,
            subdivision_num_points=cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS,
            ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            dtype=dtype,
        )

    def _fine_grained(self, features: Dict[str, Array], coords: Array) -> Array:
        fine = [point_sample(features[f], coords) for f in self.in_features]
        return jnp.concatenate(fine, axis=-1)

    @nn.compact
    def __call__(
        self,
        features: Dict[str, Array],
        targets: Optional[Array] = None,
        train: bool = False,
    ):
        coarse_logits, losses = self.coarse_head(features, targets, train=train)

        if train and targets is not None:
            rng = self.make_rng("sampling")
            coords = jax.lax.stop_gradient(
                get_uncertain_point_coords_with_randomness(
                    rng,
                    jax.lax.stop_gradient(coarse_logits),
                    None,
                    self.train_num_points,
                    self.oversample_ratio,
                    self.importance_sample_ratio,
                    uncertainty_fn=calculate_uncertainty_sem_seg,
                )
            )
            coarse_pts = point_sample(coarse_logits, coords)
            fine_pts = self._fine_grained(features, coords)
            point_logits = self.point_head(fine_pts, coarse_pts)
            point_targets = point_sample_nearest_int(targets, coords)
            valid = (point_targets != self.ignore_value) & (point_targets >= 0)
            ce = softmax_cross_entropy(
                point_logits, jnp.clip(point_targets, 0, self.num_classes - 1)
            )
            losses = dict(losses)
            losses["loss_sem_seg_point"] = jnp.sum(ce * valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
            return coarse_logits, losses

        # inference: iterative subdivision
        logits = coarse_logits
        for _ in range(self.subdivision_steps):
            logits = interpolate_bilinear(
                logits, (logits.shape[1] * 2, logits.shape[2] * 2)
            )
            n, h, w, k = logits.shape
            uncertainty = calculate_uncertainty_sem_seg(
                logits.reshape(n, h * w, k)
            ).reshape(n, h, w)
            idx, coords = get_uncertain_point_coords_on_grid(
                uncertainty, self.subdivision_num_points
            )
            fine_pts = self._fine_grained(features, coords)
            coarse_pts = point_sample(logits, coords)
            point_logits = self.point_head(fine_pts, coarse_pts)
            flat = logits.reshape(n, h * w, k)
            flat = jax.vmap(lambda f, i, v: f.at[i].set(v))(flat, idx, point_logits)
            logits = flat.reshape(n, h, w, k)
        return logits, {}

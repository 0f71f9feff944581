"""DensePose chart losses (reference:
projects/DensePose/densepose/modeling/losses/chart.py
``DensePoseChartLoss`` and chart_with_confidences.py
``DensePoseChartWithConfidenceLoss`` + IIDIsotropicGaussianUVLoss /
IndepAnisotropicGaussianUVLoss).

Losses are pure functions over point-sampled predictions; the bilinear
point sampling replaces the reference's BilinearInterpolationHelper. All
targets come pre-packed as fixed-capacity arrays with validity masks.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.ops.losses import softmax_cross_entropy
from jtsm_tpu.utils.registry import Registry

from .confidence import DensePoseConfidenceModelConfig, DensePoseUVConfidenceType

Array = jax.Array

DENSEPOSE_LOSS_REGISTRY = Registry("DENSEPOSE_LOSS")

_LOG2PI = math.log(2.0 * math.pi)


def _point_sample(features: Array, coords: Array) -> Array:
    """(N, H, W, C) x (N, P, 2 in [0,1]) -> (N, P, C) bilinear."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", "PointRend"
        ),
    )
    from point_rend.point_features import point_sample

    return point_sample(features, coords)


def iid_isotropic_gaussian_uv_nll(
    u: Array, v: Array, sigma_u: Array, target_u: Array, target_v: Array, epsilon: float
) -> Array:
    """Per-point NLL for iid residuals with isotropic covariance
    (reference chart_with_confidences.py:122)."""
    sigma2 = jax.nn.softplus(sigma_u) + epsilon
    delta_t_delta = (u - target_u) ** 2 + (v - target_v) ** 2
    return 0.5 * (_LOG2PI + 2.0 * jnp.log(sigma2) + delta_t_delta / sigma2)


def indep_anisotropic_gaussian_uv_nll(
    u: Array,
    v: Array,
    sigma_u: Array,
    kappa_u: Array,
    kappa_v: Array,
    target_u: Array,
    target_v: Array,
    epsilon: float,
) -> Array:
    """Per-point NLL for independent residuals with anisotropic covariance
    Sigma_i = sigma_i^2 I + r_i r_i^T (reference chart_with_confidences.py:160)."""
    sigma2 = jax.nn.softplus(sigma_u) + epsilon
    r_sqnorm2 = kappa_u**2 + kappa_v**2
    delta_u = u - target_u
    delta_v = v - target_v
    delta_sqnorm = delta_u**2 + delta_v**2
    delta_r = delta_u * kappa_u + delta_v * kappa_v
    denom2 = sigma2 * (sigma2 + r_sqnorm2)
    return 0.5 * (
        _LOG2PI + jnp.log(denom2) + delta_sqnorm / sigma2 - delta_r**2 / denom2
    )


@DENSEPOSE_LOSS_REGISTRY.register()
class DensePoseChartLoss:
    """Point-based chart losses (reference losses/chart.py:15): fine-segm CE
    + per-patch U/V L1, all extracted at annotated points."""

    def __init__(self, cfg: CfgNode):
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        self.w_points = dp.POINT_REGRESSION_WEIGHTS
        self.w_part = dp.PART_WEIGHTS
        self.w_segm = dp.INDEX_WEIGHTS
        self.num_patches = dp.NUM_PATCHES

    def uv_losses(
        self,
        outputs: Dict[str, Array],
        pts: Array,
        patch: Array,
        target_u: Array,
        target_v: Array,
        w: Array,
    ) -> Dict[str, Array]:
        u_at = _point_sample(outputs["u"], pts)
        v_at = _point_sample(outputs["v"], pts)
        u_sel = jnp.take_along_axis(u_at, patch[..., None], axis=2)[..., 0]
        v_sel = jnp.take_along_axis(v_at, patch[..., None], axis=2)[..., 0]
        denom = jnp.maximum(w.sum(), 1.0)
        loss_u = jnp.sum(jnp.abs(u_sel - target_u) * w) / denom
        loss_v = jnp.sum(jnp.abs(v_sel - target_v) * w) / denom
        return {
            "loss_densepose_U": loss_u * self.w_points,
            "loss_densepose_V": loss_v * self.w_points,
        }

    def __call__(
        self,
        outputs: Dict[str, Array],
        targets: Dict[str, Array],
        roi_valid: Array,
    ) -> Dict[str, Array]:
        """targets per roi: pt_coords (N,P,2) in [0,1] roi space, pt_patch
        (N,P), pt_u/pt_v (N,P), pt_valid (N,P). roi_valid (N,)."""
        pts = targets["pt_coords"]
        patch = targets["pt_patch"].astype(jnp.int32)
        w = targets["pt_valid"].astype(jnp.float32) * roi_valid[:, None]

        fine_at = _point_sample(outputs["fine_segm"], pts)  # (N, P, 25)
        ce = softmax_cross_entropy(fine_at, patch)
        loss_index = jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)

        losses = {"loss_densepose_I": loss_index * self.w_segm}
        losses.update(
            self.uv_losses(outputs, pts, patch, targets["pt_u"], targets["pt_v"], w)
        )
        return losses


@DENSEPOSE_LOSS_REGISTRY.register()
class DensePoseChartWithConfidenceLoss(DensePoseChartLoss):
    """Chart loss whose U/V term is the Gaussian NLL with learned
    confidences when UV_CONFIDENCE.ENABLED (reference
    chart_with_confidences.py:17); falls back to the plain chart loss
    otherwise."""

    def __init__(self, cfg: CfgNode):
        super().__init__(cfg)
        self.conf = DensePoseConfidenceModelConfig.from_cfg(cfg)

    def uv_losses(self, outputs, pts, patch, target_u, target_v, w):
        if not self.conf.uv_confidence.enabled:
            return super().uv_losses(outputs, pts, patch, target_u, target_v, w)

        def sel(name):
            at = _point_sample(outputs[name], pts)
            return jnp.take_along_axis(at, patch[..., None], axis=2)[..., 0]

        u_sel, v_sel, sigma_sel = sel("u"), sel("v"), sel("sigma_2")
        eps = self.conf.uv_confidence.epsilon
        if self.conf.uv_confidence.type == DensePoseUVConfidenceType.IID_ISO:
            nll = iid_isotropic_gaussian_uv_nll(
                u_sel, v_sel, sigma_sel, target_u, target_v, eps
            )
        else:
            nll = indep_anisotropic_gaussian_uv_nll(
                u_sel,
                v_sel,
                sigma_sel,
                sel("kappa_u"),
                sel("kappa_v"),
                target_u,
                target_v,
                eps,
            )
        loss_uv = jnp.sum(nll * w) / jnp.maximum(w.sum(), 1.0)
        return {"loss_densepose_UV": loss_uv * self.w_points}


def build_densepose_losses(cfg: CfgNode):
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.LOSS_NAME
    return DENSEPOSE_LOSS_REGISTRY.get(name)(cfg)

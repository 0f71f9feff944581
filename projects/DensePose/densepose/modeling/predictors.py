"""DensePose chart predictors (reference:
projects/DensePose/densepose/modeling/predictors/chart.py
``DensePoseChartPredictor`` and chart_confidence.py
``DensePoseChartConfidencePredictorMixin`` /
chart_with_confidence.py ``DensePoseChartWithConfidencePredictor``).

A predictor maps head features (N, S, S, C) to chart outputs at
2x (deconv) then UP_SCALE-x (bilinear) resolution:
  coarse_segm (N, H, H, 2|15), fine_segm (N, H, H, 25),
  u / v (N, H, H, 25), and optional confidence channels
  sigma_2 / kappa_u / kappa_v (+ fine/coarse segm confidences).
Everything is a dict of arrays — static shapes, one fused XLA program.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import ConvTranspose2d, interpolate_bilinear
from jtsm_tpu.utils.registry import Registry

from .confidence import DensePoseConfidenceModelConfig, DensePoseUVConfidenceType

Array = jax.Array

DENSEPOSE_PREDICTOR_REGISTRY = Registry("DENSEPOSE_PREDICTOR")


class _ChartPredictorBase(nn.Module):
    num_patches: int = 24
    num_coarse_segm: int = 2
    deconv_kernel: int = 4
    up_scale: int = 2
    dtype: Any = jnp.float32

    def _interp2d(self, x: Array) -> Array:
        if self.up_scale == 1:
            return x
        return interpolate_bilinear(
            x, (x.shape[1] * self.up_scale, x.shape[2] * self.up_scale)
        )

    def _lowres(self, x: Array, channels: int, name: str) -> Array:
        y = ConvTranspose2d(
            features=channels,
            kernel_size=self.deconv_kernel,
            stride=2,
            dtype=self.dtype,
            name=name,
        )(x)
        return self._interp2d(y.astype(jnp.float32))


@DENSEPOSE_PREDICTOR_REGISTRY.register()
class DensePoseChartPredictor(_ChartPredictorBase):
    """SIUV estimates (reference predictors/chart.py:14)."""

    @classmethod
    def from_config(cls, cfg: CfgNode, dtype=jnp.float32):
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return dict(
            num_patches=dp.NUM_PATCHES,
            num_coarse_segm=dp.NUM_COARSE_SEGM_CHANNELS,
            deconv_kernel=dp.DECONV_KERNEL,
            up_scale=dp.UP_SCALE,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        k = self.num_patches + 1
        return {
            "coarse_segm": self._lowres(x, self.num_coarse_segm, "ann_index_lowres"),
            "fine_segm": self._lowres(x, k, "index_uv_lowres"),
            "u": self._lowres(x, k, "u_lowres"),
            "v": self._lowres(x, k, "v_lowres"),
        }


@DENSEPOSE_PREDICTOR_REGISTRY.register()
class DensePoseChartWithConfidencePredictor(_ChartPredictorBase):
    """Chart predictor + confidence channels (reference
    predictors/chart_confidence.py:16 mixin; chart_with_confidence.py:9).

    With UV confidence: sigma_2 (iid_iso) or sigma_2+kappa_u+kappa_v
    (indep_aniso). With segm confidence: scalar per-pixel confidences that
    multiplicatively scale the fine/coarse segm logits."""

    uv_enabled: bool = False
    uv_type: str = "iid_iso"
    segm_enabled: bool = False
    segm_epsilon: float = 0.01

    @classmethod
    def from_config(cls, cfg: CfgNode, dtype=jnp.float32):
        base = DensePoseChartPredictor.from_config(cfg, dtype)
        conf = DensePoseConfidenceModelConfig.from_cfg(cfg)
        base.update(
            uv_enabled=conf.uv_confidence.enabled,
            uv_type=conf.uv_confidence.type.value,
            segm_enabled=conf.segm_confidence.enabled,
            segm_epsilon=conf.segm_confidence.epsilon,
        )
        return base

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        k = self.num_patches + 1
        out = {
            "coarse_segm": self._lowres(x, self.num_coarse_segm, "ann_index_lowres"),
            "fine_segm": self._lowres(x, k, "index_uv_lowres"),
            "u": self._lowres(x, k, "u_lowres"),
            "v": self._lowres(x, k, "v_lowres"),
        }
        if self.uv_enabled:
            out["sigma_2"] = self._lowres(x, k, "sigma_2_lowres")
            if self.uv_type == DensePoseUVConfidenceType.INDEP_ANISO.value:
                out["kappa_u"] = self._lowres(x, k, "kappa_u_lowres")
                out["kappa_v"] = self._lowres(x, k, "kappa_v_lowres")
        if self.segm_enabled:
            fine_conf = (
                jax.nn.softplus(self._lowres(x, 1, "fine_segm_confidence_lowres"))
                + self.segm_epsilon
            )
            coarse_conf = (
                jax.nn.softplus(self._lowres(x, 1, "coarse_segm_confidence_lowres"))
                + self.segm_epsilon
            )
            out["fine_segm_confidence"] = fine_conf
            out["coarse_segm_confidence"] = coarse_conf
            out["fine_segm"] = out["fine_segm"] * fine_conf
            out["coarse_segm"] = out["coarse_segm"] * coarse_conf
        return out


def build_densepose_predictor(cfg: CfgNode, dtype=jnp.float32):
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.PREDICTOR_NAME
    cls_ = DENSEPOSE_PREDICTOR_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, dtype))

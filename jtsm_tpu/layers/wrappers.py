"""Conv/Linear wrappers with fused norm+activation.

Reference: detectron2/layers/wrappers.py:40 (``Conv2d``). The reference's
empty-batch workarounds (:28 ``_NewEmptyTensorOp``) are unnecessary: XLA
handles zero-size dimensions natively, and the static-shape pipeline never
produces them anyway.

Layout: NHWC activations, HWIO kernels (TPU-native). ``dtype`` is the
computation dtype (bf16 on the hot path); parameters are stored f32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _pair(x) -> Tuple[int, int]:
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)


class QuantableConv(nn.Module):
    """2-D conv with the EXACT parameter tree of ``flax.linen.Conv``
    (``kernel`` HWIO + optional ``bias``, f32 params, compute in ``dtype``)
    plus an optional int8 inference path for the MXU's double-rate s8 mode:

    * **calibration**: when the ``quant_calib`` collection is mutable (and
      not initializing), the running activation abs-max is recorded as
      ``quant_calib/act_absmax`` while the normal-precision conv runs;
    * **int8 inference**: when a ``quant`` collection provides
      ``act_scale`` for this conv, activations are quantized per-tensor and
      weights per-output-channel (symmetric, zero-point 0 so zero padding
      stays exact) and the conv runs s8 x s8 -> s32, dequantized into
      ``dtype`` before bias/norm.

    See :mod:`jtsm_tpu.export.quantize` for the calibration driver.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"  # lax-style: string or ((ph, ph), (pw, pw))
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kshape = (
            *self.kernel_size,
            x.shape[-1] // self.feature_group_count,
            self.features,
        )
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dn = ("NHWC", "HWIO", "NHWC")
        calibrating = self.is_mutable_collection("quant_calib") and not self.is_initializing()
        if calibrating:
            absmax = self.variable(
                "quant_calib", "act_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            absmax.value = jnp.maximum(
                absmax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
        act_scale = (
            self.get_variable("quant", "act_scale", None)
            if self.has_variable("quant", "act_scale")
            else None
        )
        if act_scale is not None and not calibrating:
            s_a = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
            s_w = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-12
            )  # (Cout,)
            x_q = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_a), -127.0, 127.0
            ).astype(jnp.int8)
            w_q = jnp.clip(jnp.round(kernel / s_w), -127.0, 127.0).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x_q,
                w_q,
                window_strides=self.strides,
                padding=self.padding,
                rhs_dilation=self.kernel_dilation,
                feature_group_count=self.feature_group_count,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (s_a * s_w)).astype(self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=self.strides,
                padding=self.padding,
                rhs_dilation=self.kernel_dilation,
                feature_group_count=self.feature_group_count,
                dimension_numbers=dn,
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class Conv2d(nn.Module):
    """``norm`` may be a norm-type string (see ``get_norm``) — constructed
    inside this module under the stable name "norm" (stable names matter for
    checkpoint conversion) — or an already-built module instance, or None."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    norm: Optional[Any] = None
    activation: Optional[Callable] = None
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from .batch_norm import get_norm

        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        d = _pair(self.dilation)
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            p = _pair(self.padding)
            padding = ((p[0], p[0]), (p[1], p[1]))
        y = QuantableConv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=padding,
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            name="conv",
        )(x)
        norm = self.norm
        if isinstance(norm, str) and norm:
            norm = get_norm(norm, self.features, name="norm")
        if norm is not None and not isinstance(norm, str):
            y = norm(y)
        if self.activation is not None:
            y = self.activation(y)
        return y


class ConvTranspose2d(nn.Module):
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Union[int, Tuple[int, int]] = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.stride),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class QuantableDense(nn.Module):
    """Dense with the exact parameter tree of ``flax.linen.Dense`` plus the
    same optional int8 path as :class:`QuantableConv` (per-output-channel
    weight scales, per-tensor activation scale via the ``quant`` /
    ``quant_calib`` collections)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        calibrating = self.is_mutable_collection("quant_calib") and not self.is_initializing()
        if calibrating:
            absmax = self.variable(
                "quant_calib", "act_absmax", lambda: jnp.zeros((), jnp.float32)
            )
            absmax.value = jnp.maximum(
                absmax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
            )
        act_scale = (
            self.get_variable("quant", "act_scale", None)
            if self.has_variable("quant", "act_scale")
            else None
        )
        if act_scale is not None and not calibrating:
            s_a = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
            s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0) / 127.0, 1e-12)
            x_q = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s_a), -127.0, 127.0
            ).astype(jnp.int8)
            w_q = jnp.clip(jnp.round(kernel / s_w), -127.0, 127.0).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q,
                w_q,
                (((x_q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (s_a * s_w)).astype(self.dtype)
        else:
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class Linear(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return QuantableDense(
            features=self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="dense",
        )(x)


def interpolate_nearest(x: Array, scale: int) -> Array:
    """Nearest-neighbor x2-style upsampling for NHWC maps (FPN top-down)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def interpolate_bilinear(x: Array, out_hw: Tuple[int, int], align_corners: bool = False) -> Array:
    """Bilinear resize of NHWC maps (torch F.interpolate semantics)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if align_corners and oh > 1 and ow > 1:
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
    else:
        ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
        xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(w - 2, 0))
    fy = (ys - y0).astype(x.dtype)
    fx = (xs - x0).astype(x.dtype)

    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y0][:, :, x0 + 1] * fx[None, None, :, None]
    bot = x[:, y0 + 1][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y0 + 1][:, :, x0 + 1] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


def cat(tensors: Sequence[Array], axis: int = 0) -> Array:
    """Reference wrappers.py:18."""
    assert isinstance(tensors, (list, tuple))
    if len(tensors) == 1:
        return tensors[0]
    return jnp.concatenate(tensors, axis=axis)


def nonzero_tuple(x: Array):
    """Reference wrappers.py:118 — note: host-side/debug only; dynamic shapes
    do not jit. Inside compiled code use boolean masks instead."""
    return jnp.nonzero(x)


def shapes_to_tensor(x, device=None):
    return jnp.asarray(x)


def interpolate(x: Array, size=None, scale_factor=None, mode: str = "nearest", align_corners: bool = False) -> Array:
    """torch ``F.interpolate``-shaped dispatcher (reference wrappers.py re-export)
    over :func:`interpolate_nearest` / :func:`interpolate_bilinear` for NHWC maps."""
    if mode == "nearest":
        if scale_factor is not None:
            return interpolate_nearest(x, int(scale_factor))
        oh, ow = (size, size) if isinstance(size, int) else size
        h, w = x.shape[1:3]
        if oh % h == 0 and ow % w == 0 and oh // h == ow // w:
            return interpolate_nearest(x, oh // h)
        ys = (jnp.arange(oh) * h // oh).astype(jnp.int32)
        xs = (jnp.arange(ow) * w // ow).astype(jnp.int32)
        return x[:, ys][:, :, xs]
    if mode in ("bilinear", "linear"):
        if size is None:
            h, w = x.shape[1:3]
            size = (int(h * scale_factor), int(w * scale_factor))
        oh, ow = (size, size) if isinstance(size, int) else size
        return interpolate_bilinear(x, (int(oh), int(ow)), align_corners=align_corners)
    raise ValueError(f"unsupported interpolate mode: {mode}")

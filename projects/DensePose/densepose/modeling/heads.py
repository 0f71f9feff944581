"""DensePose head bodies (reference:
projects/DensePose/densepose/modeling/roi_heads/v1convx.py and
roi_heads/deeplab.py).

Heads map pooled ROI features (N, S, S, C) to head features; the predictor
(predictors.py) turns head features into chart outputs. On TPU all convs are
NHWC and run in the compute dtype (bf16 by default); the nonlocal block is
two batched matmuls over the flattened spatial axis — pure MXU work.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jtsm_tpu.config import CfgNode
from jtsm_tpu.layers import Conv2d, interpolate_bilinear
from jtsm_tpu.utils.registry import Registry

Array = jax.Array

ROI_DENSEPOSE_HEAD_REGISTRY = Registry("ROI_DENSEPOSE_HEAD")


@ROI_DENSEPOSE_HEAD_REGISTRY.register()
class DensePoseV1ConvXHead(nn.Module):
    """Fully convolutional head: NUM_STACKED_CONVS 3x3 convs
    (reference v1convx.py:12)."""

    num_stacked_convs: int = 8
    conv_dim: int = 512
    kernel: int = 3
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, dtype=jnp.float32):
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return dict(
            num_stacked_convs=dp.NUM_STACKED_CONVS,
            conv_dim=dp.CONV_HEAD_DIM,
            kernel=dp.CONV_HEAD_KERNEL,
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for i in range(self.num_stacked_convs):
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                activation=nn.relu,
                dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
        return x


class _NonLocalBlock2D(nn.Module):
    """Embedded-gaussian non-local block (reference deeplab.py:131
    ``NONLocalBlock2D``): y = softmax(theta phi^T) g, residual-added.
    Flattened-spatial batched matmuls -> MXU-friendly."""

    inter_channels: int
    norm: str = "GN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        inter = self.inter_channels

        def proj(name):
            return Conv2d(features=inter, kernel_size=1, dtype=self.dtype, name=name)

        g = proj("g")(x).reshape(n, h * w, inter)
        theta = proj("theta")(x).reshape(n, h * w, inter)
        phi = proj("phi")(x).reshape(n, h * w, inter)
        attn = jax.nn.softmax(
            jnp.einsum("npc,nqc->npq", theta.astype(jnp.float32), phi.astype(jnp.float32)),
            axis=-1,
        )
        y = jnp.einsum("npq,nqc->npc", attn, g.astype(jnp.float32))
        y = y.reshape(n, h, w, inter).astype(x.dtype)
        y = Conv2d(
            features=c,
            kernel_size=1,
            use_bias=not self.norm,
            norm=self.norm,
            dtype=self.dtype,
            name="W",
        )(y)
        return x + y


class _DPASPP(nn.Module):
    """torchvision-style ASPP with GN (reference deeplab.py:80-128): 1x1 +
    three dilated 3x3 branches + image pooling, concat, 1x1 project."""

    out_channels: int
    dilations: Sequence[int] = (6, 12, 56)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        branches = [
            Conv2d(
                features=self.out_channels,
                kernel_size=1,
                use_bias=False,
                norm="GN",
                activation=nn.relu,
                dtype=self.dtype,
                name="conv1x1",
            )(x)
        ]
        for d in self.dilations:
            branches.append(
                Conv2d(
                    features=self.out_channels,
                    kernel_size=3,
                    padding=d,
                    dilation=d,
                    use_bias=False,
                    norm="GN",
                    activation=nn.relu,
                    dtype=self.dtype,
                    name=f"conv3x3_d{d}",
                )(x)
            )
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm="GN",
            activation=nn.relu,
            dtype=self.dtype,
            name="pool_conv",
        )(pooled)
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        return Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm="GN",
            activation=nn.relu,
            dtype=self.dtype,
            name="project",
        )(y)


@ROI_DENSEPOSE_HEAD_REGISTRY.register()
class DensePoseDeepLabHead(nn.Module):
    """ASPP (+ optional non-local) then stacked convs
    (reference deeplab.py:17 ``DensePoseDeepLabHead``)."""

    num_stacked_convs: int = 8
    conv_dim: int = 512
    kernel: int = 3
    norm: str = "GN"
    use_nonlocal: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: CfgNode, dtype=jnp.float32):
        dp = cfg.MODEL.ROI_DENSEPOSE_HEAD
        return dict(
            num_stacked_convs=dp.NUM_STACKED_CONVS,
            conv_dim=dp.CONV_HEAD_DIM,
            kernel=dp.CONV_HEAD_KERNEL,
            norm=dp.DEEPLAB.NORM,
            use_nonlocal=bool(dp.DEEPLAB.NONLOCAL_ON),
            dtype=dtype,
        )

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = _DPASPP(out_channels=x.shape[-1], dtype=self.dtype, name="ASPP")(x)
        if self.use_nonlocal:
            x = _NonLocalBlock2D(
                inter_channels=max(1, x.shape[-1] // 2),
                norm=self.norm,
                dtype=self.dtype,
                name="NLBlock",
            )(x)
        for i in range(self.num_stacked_convs):
            x = Conv2d(
                features=self.conv_dim,
                kernel_size=self.kernel,
                padding=self.kernel // 2,
                use_bias=not self.norm,
                norm=self.norm,
                activation=nn.relu,
                dtype=self.dtype,
                name=f"body_conv_fcn{i + 1}",
            )(x)
        return x


def build_densepose_head(cfg: CfgNode, dtype=jnp.float32):
    name = cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME or "DensePoseV1ConvXHead"
    cls_ = ROI_DENSEPOSE_HEAD_REGISTRY.get(name)
    return cls_(**cls_.from_config(cfg, dtype))

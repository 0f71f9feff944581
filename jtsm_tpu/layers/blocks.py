"""Shared CNN blocks (reference: detectron2/layers/blocks.py:16
``CNNBlockBase``, :58 ``DepthwiseSeparableConv2d``)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .batch_norm import get_norm
from .wrappers import Conv2d


class CNNBlockBase(nn.Module):
    """Contract: attributes in_channels / out_channels / stride.

    Freezing in the reference mutates requires_grad; in JAX freezing is done
    at the graph level by ``jax.lax.stop_gradient`` on a stage's output (see
    ResNet.freeze_at handling) — so there is no ``freeze()`` method here.
    """

    in_channels: int = 0
    out_channels: int = 0
    stride: int = 1


class DepthwiseSeparableConv2d(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, each with optional norm+activation."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    dilation: int = 1
    norm1: Optional[str] = None
    activation1: Optional[Any] = None
    norm2: Optional[str] = None
    activation2: Optional[Any] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(
            features=self.in_channels,
            kernel_size=self.kernel_size,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.in_channels,
            use_bias=not self.norm1,
            norm=self.norm1,
            activation=self.activation1,
            dtype=self.dtype,
            name="depthwise",
        )(x)
        x = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=not self.norm2,
            norm=self.norm2,
            activation=self.activation2,
            dtype=self.dtype,
            name="pointwise",
        )(x)
        return x

"""ASPP (reference: detectron2/layers/aspp.py:14): parallel dilated convs +
image pooling, concat, 1x1 project."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .batch_norm import get_norm
from .wrappers import Conv2d, interpolate_bilinear


class ASPP(nn.Module):
    in_channels: int
    out_channels: int
    dilations: Sequence[int] = (6, 12, 18)
    norm: str = ""
    activation: Any = nn.relu
    pool_kernel_size: Optional[Sequence[int]] = None  # None => global pool
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert len(self.dilations) == 3
        res = []
        res.append(
            Conv2d(
                features=self.out_channels,
                kernel_size=1,
                use_bias=not self.norm,
                norm=self.norm,
                activation=self.activation,
                dtype=self.dtype,
                name="conv1x1",
            )(x)
        )
        for i, d in enumerate(self.dilations):
            res.append(
                Conv2d(
                    features=self.out_channels,
                    kernel_size=3,
                    padding=d,
                    dilation=d,
                    use_bias=not self.norm,
                    norm=self.norm,
                    activation=self.activation,
                    dtype=self.dtype,
                    name=f"conv3x3_d{d}",
                )(x)
            )
        h, w = x.shape[1], x.shape[2]
        if self.pool_kernel_size is None:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            kh, kw = self.pool_kernel_size
            pooled = nn.avg_pool(x, (kh, kw), strides=(kh, kw))
        pooled = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=True,
            activation=self.activation,
            dtype=self.dtype,
            name="image_pool_conv",
        )(pooled)
        pooled = interpolate_bilinear(pooled, (h, w))
        res.append(pooled)

        y = jnp.concatenate(res, axis=-1)
        y = Conv2d(
            features=self.out_channels,
            kernel_size=1,
            use_bias=not self.norm,
            norm=self.norm,
            activation=self.activation,
            dtype=self.dtype,
            name="project",
        )(y)
        if self.dropout > 0:
            y = nn.Dropout(rate=self.dropout, deterministic=deterministic)(y)
        return y

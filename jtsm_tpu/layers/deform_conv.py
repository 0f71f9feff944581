"""Deformable convolution v1/v2 (reference: detectron2/layers/deform_conv.py
+ `layers/csrc/deformable/` CUDA im2col kernels, ~2.8k LoC).

TPU re-design: the im2col + offset-sampling kernel becomes a bilinear gather
(like ops.roi_align) followed by ONE big matmul — exactly the decomposition
the CUDA kernel hand-fuses, but here XLA autodiffs it (the backward becomes
scatter-adds) and the contraction lands on the MXU."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def deform_conv2d(
    x: Array,  # (B, H, W, Cin)
    offsets: Array,  # (B, H, W, 2*K*K) (dy, dx pairs, torch channel order)
    kernel: Array,  # (K, K, Cin, Cout)
    mask: Array | None = None,  # (B, H, W, K*K) modulation (DCNv2)
    stride: int = 1,
    dilation: int = 1,
) -> Array:
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    oh = (h - 1) // stride + 1
    ow = (w - 1) // stride + 1

    # base sampling grid per output position and kernel tap
    ys = jnp.arange(oh) * stride
    xs = jnp.arange(ow) * stride
    ky = (jnp.arange(k) - (k - 1) / 2.0) * dilation
    kx = (jnp.arange(k) - (k - 1) / 2.0) * dilation
    base_y = ys[:, None, None, None] + ky[None, None, :, None]  # (OH,1,K,1)
    base_x = xs[None, :, None, None] + kx[None, None, None, :]  # (1,OW,1,K)

    off = offsets.reshape(b, oh, ow, k * k, 2)
    dy = off[..., 0].reshape(b, oh, ow, k, k)
    dx = off[..., 1].reshape(b, oh, ow, k, k)
    sy = base_y[None] + dy  # (B, OH, OW, K, K)
    sx = base_x[None] + dx

    # bilinear sample with zero padding
    def sample(img, yy, xx):
        # img (H, W, Cin); yy/xx (...,)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        fy = (yy - y0)[..., None]
        fx = (xx - x0)[..., None]
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            v = img[yc, xc]
            return v * valid[..., None].astype(img.dtype)

        return (
            tap(y0, x0) * (1 - fy) * (1 - fx)
            + tap(y0, x0 + 1) * (1 - fy) * fx
            + tap(y0 + 1, x0) * fy * (1 - fx)
            + tap(y0 + 1, x0 + 1) * fy * fx
        )

    cols = jax.vmap(sample)(x, sy, sx)  # (B, OH, OW, K, K, Cin)
    if mask is not None:
        m = mask.reshape(b, oh, ow, k, k)
        cols = cols * m[..., None].astype(cols.dtype)
    cols = cols.reshape(b, oh, ow, k * k * cin)
    wmat = kernel.reshape(k * k * cin, -1)
    return jnp.einsum(
        "bhwi,io->bhwo", cols, wmat.astype(cols.dtype)
    )


class DeformConv(nn.Module):
    """DCNv1 module: offsets provided by the caller (reference
    deform_conv.py:61)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, offsets: Array) -> Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        y = deform_conv2d(
            x.astype(self.dtype),
            offsets.astype(jnp.float32),
            kernel.astype(self.dtype),
            None,
            self.stride,
            self.dilation,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return y


class ModulatedDeformConv(nn.Module):
    """DCNv2: offsets + sigmoid modulation mask (reference deform_conv.py:220)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, offsets: Array, mask: Array) -> Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        y = deform_conv2d(
            x.astype(self.dtype),
            offsets.astype(jnp.float32),
            kernel.astype(self.dtype),
            jax.nn.sigmoid(mask.astype(jnp.float32)),
            self.stride,
            self.dilation,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return y

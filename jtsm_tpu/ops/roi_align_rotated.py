"""Rotated ROIAlign (reference: detectron2/layers/roi_align_rotated.py:19 and
csrc/ROIAlignRotated/ kernels).

Same gather+bilinear decomposition as ops.roi_align but the sampling grid is
rotated by each ROI's angle around its center.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .roi_align import _gather_interpolate, _prep

Array = jax.Array


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_rotated_batched(
    features: Array,  # (B, H, W, C)
    boxes: Array,  # (R, 5) (cx, cy, w, h, angle_deg)
    batch_indices: Array,  # (R,)
    output_size: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> Array:
    b, h, w, c = features.shape
    p = output_size
    s = max(int(sampling_ratio), 1)
    r = boxes.shape[0]

    cx = boxes[:, 0] * spatial_scale - 0.5
    cy = boxes[:, 1] * spatial_scale - 0.5
    rw = boxes[:, 2] * spatial_scale
    rh = boxes[:, 3] * spatial_scale
    theta = boxes[:, 4] * (math.pi / 180.0)

    bin_w = rw / p
    bin_h = rh / p
    grid = (
        jnp.arange(p, dtype=jnp.float32)[:, None]
        + (jnp.arange(s, dtype=jnp.float32)[None, :] + 0.5) / s
    ).reshape(-1)  # (P*S,)
    # local coords centered at ROI center
    ly = (grid[None, :] * bin_h[:, None]) - rh[:, None] / 2  # (R, PS)
    lx = (grid[None, :] * bin_w[:, None]) - rw[:, None] / 2

    cos_t = jnp.cos(theta)[:, None, None]
    sin_t = jnp.sin(theta)[:, None, None]
    # rotate: (y, x) grid outer product — full (R, PS, PS) coords
    ys = cy[:, None, None] + ly[:, :, None] * cos_t + lx[:, None, :] * sin_t
    xs = cx[:, None, None] - ly[:, :, None] * sin_t + lx[:, None, :] * cos_t

    # non-separable: run prep on the full grids
    def prep2(coords, size):
        out_of_range = (coords < -1.0) | (coords > size)
        coords = jnp.clip(coords, 0.0)
        lo = jnp.floor(coords)
        frac = coords - lo
        lo = lo.astype(jnp.int32)
        hi_oob = lo >= size - 1
        lo = jnp.where(hi_oob, size - 2, lo)
        frac = jnp.where(hi_oob, 1.0, frac)
        lo = jnp.clip(lo, 0, max(size - 2, 0))
        return lo, frac, out_of_range

    ylo, yfrac, y_oob = prep2(ys, h)
    xlo, xfrac, x_oob = prep2(xs, w)
    row_base = batch_indices.astype(jnp.int32)[:, None, None] * (h * w)
    base = row_base + ylo * w + xlo
    zero = y_oob | x_oob

    flat = features.reshape(b * h * w, c)

    def gather(idx):
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(r, p * s, p * s, c)

    v00 = gather(base)
    v01 = gather(base + 1)
    v10 = gather(base + w)
    v11 = gather(base + w + 1)

    dt = flat.dtype
    fy = yfrac[..., None].astype(dt)
    fx = xfrac[..., None].astype(dt)
    one = jnp.asarray(1.0, dt)
    val = (
        v00 * (one - fy) * (one - fx)
        + v01 * (one - fy) * fx
        + v10 * fy * (one - fx)
        + v11 * fy * fx
    )
    val = jnp.where(zero[..., None], jnp.asarray(0.0, dt), val)
    val = val.reshape(r, p, s, p, s, c)
    return val.mean(axis=(2, 4))


# reference layers/roi_align_rotated.py — functional + module-style aliases
def roi_align_rotated(features, boxes, batch_indices, output_size, spatial_scale=1.0, sampling_ratio=2):
    """Alias of :func:`roi_align_rotated_batched` under the reference's
    public name (layers/roi_align_rotated.py:19)."""
    return roi_align_rotated_batched(
        features, boxes, batch_indices, output_size, spatial_scale, sampling_ratio
    )


class ROIAlignRotated:
    """Module-style wrapper (reference layers/roi_align_rotated.py:50). Rois
    use the (batch_idx, cx, cy, w, h, angle_deg) layout."""

    def __init__(self, output_size, spatial_scale: float, sampling_ratio: int = 2):
        self.output_size = output_size if isinstance(output_size, int) else output_size[0]
        self.spatial_scale = float(spatial_scale)
        self.sampling_ratio = int(sampling_ratio)

    def __call__(self, features: Array, rois: Array) -> Array:
        return roi_align_rotated_batched(
            features,
            rois[:, 1:6],
            rois[:, 0].astype(jnp.int32),
            self.output_size,
            self.spatial_scale,
            self.sampling_ratio,
        )

    def __repr__(self):
        return (
            f"ROIAlignRotated(output_size={self.output_size}, "
            f"spatial_scale={self.spatial_scale}, sampling_ratio={self.sampling_ratio})"
        )

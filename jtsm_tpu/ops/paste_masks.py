"""Paste fixed-size ROI masks into full-image masks.

Reference: detectron2/layers/mask_ops.py:74 ``paste_masks_in_image`` (the
grid-sample based ``_do_paste_mask`` with a 1 GB chunk cap). TPU re-design:
the inverse bilinear map is computed for the whole image grid per instance
(separable: a length-H y-weight vector x a length-W x-weight vector), so the
paste is two small matmuls per instance — MXU-friendly — instead of a
gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _axis_weights(lo: Array, hi: Array, size: int, mask_size: int) -> Array:
    """Sampling weight matrix (size, mask_size): row p holds the bilinear
    weights of mask cells for image pixel p, for a box spanning [lo, hi)."""
    # image pixel centers mapped to mask coordinates
    img_coords = (jnp.arange(size, dtype=jnp.float32) + 0.5 - lo) / jnp.maximum(
        hi - lo, 1e-6
    ) * mask_size - 0.5
    cell = jnp.arange(mask_size, dtype=jnp.float32)
    # bilinear hat weights, clamped at the borders (replicate edge like
    # grid_sample align_corners=False with border handling in the reference)
    coords = jnp.clip(img_coords, 0.0, mask_size - 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - cell[None, :]))
    inside = (img_coords > -1.0) & (img_coords < mask_size)
    return w * inside[:, None].astype(w.dtype)


@partial(jax.jit, static_argnames=("image_shape", "threshold"))
def paste_masks_in_image(
    masks: Array, boxes: Array, image_shape: tuple, threshold: float = 0.5
) -> Array:
    """masks: (N, S, S) probabilities; boxes: (N, 4) XYXY -> (N, H, W) bool
    (or float probabilities if threshold < 0)."""
    h, w = image_shape
    s = masks.shape[-1]

    def paste_one(mask, box):
        wy = _axis_weights(box[1], box[3], h, s)  # (H, S)
        wx = _axis_weights(box[0], box[2], w, s)  # (W, S)
        # (H, S) @ (S, S) @ (S, W)
        out = wy @ mask.astype(jnp.float32) @ wx.T
        return out

    out = jax.vmap(paste_one)(masks, boxes)
    if threshold >= 0:
        return out >= threshold
    return out

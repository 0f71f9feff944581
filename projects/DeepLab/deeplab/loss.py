"""DeepLab hard-pixel-mining CE (reference: projects/DeepLab/deeplab/loss.py
``DeepLabCE`` — top-k hardest pixels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jtsm_tpu.ops.losses import softmax_cross_entropy

Array = jax.Array


def DeepLabCE(
    logits: Array,  # (B, H, W, K)
    targets: Array,  # (B, H, W)
    ignore_value: int = 255,
    top_k_percent_pixels: float = 0.2,
    weights: Array | None = None,  # (B, H, W) per-pixel loss weights
) -> Array:
    valid = (targets != ignore_value) & (targets >= 0)
    ce = softmax_cross_entropy(logits, jnp.clip(targets, 0, logits.shape[-1] - 1))
    ce = jnp.where(valid, ce, 0.0)
    if weights is not None:
        ce = ce * weights
    if top_k_percent_pixels >= 1.0:
        return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)
    b = ce.shape[0]
    flat = ce.reshape(b, -1)
    k = max(1, int(top_k_percent_pixels * flat.shape[1]))
    topv, _ = jax.lax.top_k(flat, k)
    return topv.mean()

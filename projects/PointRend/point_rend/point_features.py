"""Point sampling utilities (reference:
projects/PointRend/point_rend/point_features.py:28 ``point_sample``, :72/:128
uncertainty-based point selection). Natural fits for JAX gathers."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def point_sample(features: Array, point_coords: Array, align_corners: bool = False) -> Array:
    """features: (N, H, W, C); point_coords: (N, P, 2) in [0, 1] (x, y) ->
    (N, P, C) bilinear samples (grid_sample semantics)."""
    n, h, w, c = features.shape

    def one(feat, pts):
        if align_corners:
            xs = pts[:, 0] * (w - 1)
            ys = pts[:, 1] * (h - 1)
        else:
            xs = pts[:, 0] * w - 0.5
            ys = pts[:, 1] * h - 0.5
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        fx = xs - x0
        fy = ys - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)

        def tap(yi, xi):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            v = feat[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            return v * valid[:, None].astype(feat.dtype)

        return (
            tap(y0, x0) * ((1 - fy) * (1 - fx))[:, None]
            + tap(y0, x0 + 1) * ((1 - fy) * fx)[:, None]
            + tap(y0 + 1, x0) * (fy * (1 - fx))[:, None]
            + tap(y0 + 1, x0 + 1) * (fy * fx)[:, None]
        )

    return jax.vmap(one)(features, point_coords)


def generate_regular_grid_point_coords(n: int, side_size: int) -> Array:
    """(N, side*side, 2) regular grid in [0, 1]."""
    step = 1.0 / side_size
    coords = (jnp.arange(side_size, dtype=jnp.float32) + 0.5) * step
    gy, gx = jnp.meshgrid(coords, coords, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    return jnp.broadcast_to(grid[None], (n, side_size * side_size, 2))


def calculate_uncertainty(logits: Array, classes: Array) -> Array:
    """-|logit of the predicted class| per point (reference roi_heads.py
    uncertainty)."""
    if logits.shape[-1] == 1:
        sel = logits[..., 0]
    else:
        sel = jnp.take_along_axis(
            logits, jnp.clip(classes, 0, logits.shape[-1] - 1)[:, None, None], axis=2
        )[..., 0]
    return -jnp.abs(sel)


def get_uncertain_point_coords_on_grid(
    uncertainty_map: Array, num_points: int
) -> Tuple[Array, Array]:
    """uncertainty_map: (N, H, W) -> indices + coords of the top-k most
    uncertain grid cells (reference :128)."""
    n, h, w = uncertainty_map.shape
    flat = uncertainty_map.reshape(n, h * w)
    num_points = min(num_points, h * w)
    _, idx = jax.lax.top_k(flat, num_points)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    coords = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=2)
    return idx, coords


def calculate_uncertainty_sem_seg(point_logits: Array) -> Array:
    """Top-1 minus top-2 logit difference, negated (reference
    semantic_seg.py:19 ``calculate_uncertainty``): most uncertain where the
    two best classes are closest. point_logits (N, P, K) -> (N, P)."""
    top2 = jax.lax.top_k(point_logits, 2)[0]
    return top2[..., 1] - top2[..., 0]


def get_uncertain_point_coords_with_randomness(
    rng: Array,
    coarse_logits: Array,  # (N, S, S, K)
    classes: Array,  # (N,) or None when uncertainty_fn is given
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    uncertainty_fn=None,
) -> Array:
    """Training-time point selection (reference :72): oversample random
    points, keep the most uncertain fraction, fill the rest randomly."""
    n = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    point_coords = jax.random.uniform(r1, (n, num_sampled, 2))
    point_logits = point_sample(coarse_logits, point_coords)
    if uncertainty_fn is not None:
        uncert = uncertainty_fn(point_logits)  # (N, num_sampled)
    else:
        uncert = calculate_uncertainty(point_logits, classes)  # (N, num_sampled)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain
    _, idx = jax.lax.top_k(uncert, num_uncertain)
    important = jnp.take_along_axis(point_coords, idx[..., None], axis=1)
    rand = jax.random.uniform(r2, (n, num_random, 2))
    return jnp.concatenate([important, rand], axis=1)

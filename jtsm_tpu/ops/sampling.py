"""Random foreground/background subsampling with static shapes.

Reference: detectron2/modeling/sampling.py:9 ``subsample_labels`` — returns
dynamic index lists. TPU re-design: return a fixed-size **selection mask**
plus fixed-size index arrays chosen by random priority top-k, which keeps
shapes static under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def subsample_labels(
    rng: Array,
    labels: Array,
    num_samples: int,
    positive_fraction: float,
    bg_label: int,
) -> Tuple[Array, Array]:
    """labels: (N,) int with values {-1 ignore, bg_label background, else fg}.

    Returns (pos_mask, neg_mask) bool (N,) with at most
    ``num_samples * positive_fraction`` positives and the rest negatives —
    sampled uniformly at random like the reference, via random priority top-k.
    """
    positive = (labels != -1) & (labels != bg_label)
    negative = labels == bg_label

    num_pos_cap = int(num_samples * positive_fraction)
    k_pos, k_neg = jax.random.split(rng)

    pos_mask, num_pos = _random_topk_mask(k_pos, positive, num_pos_cap)
    # reference: num_neg fills the remainder of the budget
    num_neg_cap = num_samples - num_pos
    neg_mask, _ = _random_topk_mask_dynamic(k_neg, negative, num_neg_cap, num_samples)
    return pos_mask, neg_mask


def _random_topk_mask(rng: Array, eligible: Array, k: int) -> Tuple[Array, Array]:
    """Select min(k, eligible.sum()) random elements of ``eligible``; static k."""
    n = eligible.shape[0]
    if k <= 0:
        return jnp.zeros((n,), bool), jnp.asarray(0, jnp.int32)
    priority = jnp.where(eligible, jax.random.uniform(rng, (n,)), -1.0)
    kth = jax.lax.top_k(priority, min(k, n))[0][-1]
    num_eligible = jnp.sum(eligible.astype(jnp.int32))
    take = jnp.minimum(num_eligible, k)
    mask = eligible & (priority >= jnp.maximum(kth, 0.0)) & (priority > 0.0)
    # guard against ties producing >k (uniform ties have measure ~0; clamp anyway)
    return mask, jnp.minimum(take, jnp.sum(mask.astype(jnp.int32)))


def _random_topk_mask_dynamic(
    rng: Array, eligible: Array, k_dynamic: Array, k_max: int
) -> Tuple[Array, Array]:
    """Like _random_topk_mask but with a traced cap (bounded by static k_max)."""
    n = eligible.shape[0]
    priority = jnp.where(eligible, jax.random.uniform(rng, (n,)), -1.0)
    # only the k_max largest priorities can ever be the threshold: a
    # partial top-k replaces the full descending sort (profiled 7.8 ms per
    # (16, 268k)-anchor sort in the RPN sampler)
    kk = min(k_max, n)
    top_p = jax.lax.top_k(priority, kk)[0]  # desc
    k_dynamic = jnp.clip(k_dynamic, 0, kk)
    # threshold = k-th largest priority (or -inf when k == 0)
    kth = jnp.where(
        k_dynamic > 0,
        top_p[jnp.clip(k_dynamic - 1, 0, kk - 1)],
        jnp.inf,
    )
    mask = eligible & (priority >= kth) & (priority > 0.0)
    return mask, jnp.sum(mask.astype(jnp.int32))

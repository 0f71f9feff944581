"""Point head MLP (reference: projects/PointRend/point_rend/point_head.py:100
``StandardPointHead``)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class StandardPointHead(nn.Module):
    num_classes: int
    fc_dim: int = 256
    num_fc: int = 3
    coarse_pred_each_layer: bool = True
    cls_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine_features: Array, coarse_features: Array) -> Array:
        """fine (N, P, Cf) + coarse logits (N, P, K) -> point logits (N, P, K)."""
        x = jnp.concatenate([fine_features, coarse_features], axis=-1)
        for i in range(self.num_fc):
            x = nn.Dense(
                self.fc_dim,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
                name=f"fc{i + 1}",
            )(x)
            x = nn.relu(x)
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse_features], axis=-1)
        k = 1 if self.cls_agnostic else self.num_classes
        return nn.Dense(
            k,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x).astype(jnp.float32)

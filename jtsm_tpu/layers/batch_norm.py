"""Normalization zoo (reference: detectron2/layers/batch_norm.py).

TPU-native notes:
* ``FrozenBatchNorm2d`` (reference :14) holds its four tensors in the
  ``frozen`` variable collection so optimizers never see them; at apply time
  it is a single fused multiply-add.
* ``NaiveSyncBatchNorm`` (reference :171 — cross-GPU all-reduce of moments)
  needs NO explicit collective here: under ``pjit`` with a batch-sharded
  input, ``jnp.mean`` over the batch axis *is* the global mean (XLA inserts
  the all-reduce over ICI). The reference's hand-written AllReduce autograd
  function dissolves into the compiler.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class FrozenBatchNorm2d(nn.Module):
    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.num_features
        weight = self.variable("frozen", "weight", lambda: jnp.ones((c,), jnp.float32)).value
        bias = self.variable("frozen", "bias", lambda: jnp.zeros((c,), jnp.float32)).value
        mean = self.variable(
            "frozen", "running_mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "frozen", "running_var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class NaiveSyncBatchNorm(nn.Module):
    """Batch norm whose statistics are global across the data mesh axis when
    the batch is sharded (see module docstring). Running stats live in
    ``batch_stats``."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.9
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: Optional[bool] = None) -> Array:
        if self.use_running_average is None and use_running_average is None:
            # flax convention: training iff the caller made batch_stats
            # mutable (apply(..., mutable=["batch_stats"])); eval otherwise
            use_ra = not (
                self.is_initializing() or self.is_mutable_collection("batch_stats")
            )
        else:
            use_ra = nn.merge_param(
                "use_running_average", self.use_running_average, use_running_average
            )
        c = self.num_features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            meansqr = jnp.mean(xf * xf, axis=axes)
            var = meansqr - mean * mean
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class GroupNorm32(nn.Module):
    num_features: int
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import math

        groups = math.gcd(self.num_groups, self.num_features)
        gn = nn.GroupNorm(
            num_groups=groups, epsilon=self.eps, dtype=x.dtype, param_dtype=jnp.float32
        )
        return gn(x)


class LayerNormCF(nn.Module):
    """Channel-last layer norm."""

    num_features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.LayerNorm(epsilon=self.eps, dtype=x.dtype, param_dtype=jnp.float32)(x)


def get_norm(norm: str | Callable | None, out_channels: int, name: str | None = None):
    """Reference batch_norm.py:128. Returns a flax Module instance or None."""
    if norm is None or norm == "":
        return None
    if isinstance(norm, str):
        norm_map = {
            "BN": lambda c, n: NaiveSyncBatchNorm(c, name=n),
            "SyncBN": lambda c, n: NaiveSyncBatchNorm(c, name=n),
            "nnSyncBN": lambda c, n: NaiveSyncBatchNorm(c, name=n),
            "naiveSyncBN": lambda c, n: NaiveSyncBatchNorm(c, name=n),
            "FrozenBN": lambda c, n: FrozenBatchNorm2d(c, name=n),
            "GN": lambda c, n: GroupNorm32(c, name=n),
            "LN": lambda c, n: LayerNormCF(c, name=n),
        }
        if norm not in norm_map:
            raise KeyError(f"Unknown norm type: {norm}")
        return norm_map[norm](out_channels, name)
    return norm(out_channels)


# Reference wrappers.py re-exports ``BatchNorm2d`` (= torch.nn.BatchNorm2d).
# Here plain BN *is* NaiveSyncBatchNorm: jnp.mean over the batch axis is the
# local-batch mean on one device and the global mean under a data-sharded
# pjit mesh (XLA inserts the all-reduce) — the sync/non-sync split dissolves.
BatchNorm2d = NaiveSyncBatchNorm

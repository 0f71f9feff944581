"""Named LR schedule callables under the reference class names
(reference: detectron2/solver/lr_scheduler.py:16 ``WarmupMultiStepLR``,
:52 ``WarmupCosineLR``, :90 ``_get_warmup_factor_at_iter``).

The reference classes are torch ``_LRScheduler``s mutating an optimizer;
here a schedule is a pure ``step -> lr`` callable that optax consumes
(``optax.scale_by_schedule`` / ``inject_hyperparams``), so these are
constructor-compatible callables rather than stateful objects. The math
matches the reference exactly: per-milestone gamma decay / half-cosine over
``max_iters``, with constant-or-linear warmup blended in."""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

__all__ = ["WarmupMultiStepLR", "WarmupCosineLR", "WarmupPolyLR", "get_warmup_factor_at_iter"]


def get_warmup_factor_at_iter(method: str, it, warmup_iters: int, warmup_factor: float):
    """Reference lr_scheduler.py:90 — warmup multiplier at iteration ``it``."""
    if warmup_iters <= 0:
        return jnp.ones_like(jnp.asarray(it, jnp.float32))
    if method == "constant":
        w = jnp.asarray(warmup_factor, jnp.float32)
    elif method == "linear":
        alpha = jnp.clip(jnp.asarray(it, jnp.float32) / warmup_iters, 0.0, 1.0)
        w = warmup_factor * (1 - alpha) + alpha
    else:
        raise ValueError(f"Unknown warmup method: {method}")
    return jnp.where(jnp.asarray(it) < warmup_iters, w, 1.0)


class _WarmupSchedule:
    def __init__(self, base_lr: float, warmup_factor: float, warmup_iters: int, warmup_method: str):
        self.base_lr = float(base_lr)
        self.warmup_factor = float(warmup_factor)
        self.warmup_iters = int(warmup_iters)
        self.warmup_method = warmup_method

    def _warmup(self, step):
        return get_warmup_factor_at_iter(
            self.warmup_method, step, self.warmup_iters, self.warmup_factor
        )


class WarmupMultiStepLR(_WarmupSchedule):
    """Milestone-decay schedule (reference lr_scheduler.py:16)."""

    def __init__(
        self,
        base_lr: float = 1.0,
        milestones: Sequence[int] = (),
        gamma: float = 0.1,
        warmup_factor: float = 0.001,
        warmup_iters: int = 1000,
        warmup_method: str = "linear",
    ):
        if list(milestones) != sorted(milestones):
            raise ValueError(f"Milestones should be increasing integers. Got {milestones}")
        super().__init__(base_lr, warmup_factor, warmup_iters, warmup_method)
        self.milestones = tuple(int(m) for m in milestones)
        self.gamma = float(gamma)

    def __call__(self, step):
        decay = jnp.asarray(1.0, jnp.float32)
        for m in self.milestones:
            decay = decay * jnp.where(jnp.asarray(step) >= m, self.gamma, 1.0)
        return self.base_lr * self._warmup(step) * decay


class WarmupCosineLR(_WarmupSchedule):
    """Half-cosine decay over ``max_iters`` (reference lr_scheduler.py:52)."""

    def __init__(
        self,
        base_lr: float = 1.0,
        max_iters: int = 1,
        warmup_factor: float = 0.001,
        warmup_iters: int = 1000,
        warmup_method: str = "linear",
    ):
        super().__init__(base_lr, warmup_factor, warmup_iters, warmup_method)
        self.max_iters = int(max_iters)

    def __call__(self, step):
        progress = jnp.clip(jnp.asarray(step, jnp.float32) / max(self.max_iters, 1), 0.0, 1.0)
        return self.base_lr * self._warmup(step) * 0.5 * (1.0 + jnp.cos(math.pi * progress))


class WarmupPolyLR(_WarmupSchedule):
    """Polynomial decay (DeepLab project; reference
    projects/DeepLab/deeplab/lr_scheduler.py)."""

    def __init__(
        self,
        base_lr: float = 1.0,
        max_iters: int = 1,
        warmup_factor: float = 0.001,
        warmup_iters: int = 1000,
        warmup_method: str = "linear",
        power: float = 0.9,
        constant_ending: float = 0.0,
    ):
        super().__init__(base_lr, warmup_factor, warmup_iters, warmup_method)
        self.max_iters = int(max_iters)
        self.power = float(power)
        self.constant_ending = float(constant_ending)

    def __call__(self, step):
        poly = (1.0 - jnp.clip(jnp.asarray(step, jnp.float32) / max(self.max_iters, 1), 0.0, 1.0)) ** self.power
        poly = jnp.maximum(poly, self.constant_ending)
        return self.base_lr * self._warmup(step) * poly

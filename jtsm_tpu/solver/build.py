"""Optimizer + LR schedule construction on optax.

Reference: detectron2/solver/build.py:110 (``build_optimizer`` — SGD with
per-parameter lr/weight-decay overrides), lr_scheduler.py:16/52
(``WarmupMultiStepLR`` / ``WarmupCosineLR``).

TPU re-design: per-param-group overrides become optax masks; the scheduler is
a pure ``step -> lr`` function folded into the optimizer via
``optax.scale_by_schedule``-style injection (we scale updates by lr at apply
time so checkpointed optimizer state is lr-free).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import CfgNode


def build_lr_schedule(cfg: CfgNode) -> Callable:
    """Returns step -> lr multiplier * BASE_LR."""
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    base_lr = cfg.SOLVER.BASE_LR
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_method = cfg.SOLVER.WARMUP_METHOD
    steps = tuple(cfg.SOLVER.STEPS)
    gamma = cfg.SOLVER.GAMMA
    max_iter = cfg.SOLVER.MAX_ITER

    def warmup(step):
        if warmup_method == "constant":
            w = warmup_factor
        else:  # linear
            alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            w = warmup_factor * (1 - alpha) + alpha
        return jnp.where(step < warmup_iters, w, 1.0)

    if name == "WarmupMultiStepLR":

        def schedule(step):
            decay = jnp.asarray(1.0)
            for s in steps:
                decay = decay * jnp.where(step >= s, gamma, 1.0)
            return base_lr * warmup(step) * decay

    elif name == "WarmupCosineLR":

        def schedule(step):
            progress = jnp.clip(step / max(max_iter, 1), 0.0, 1.0)
            return base_lr * warmup(step) * 0.5 * (1.0 + jnp.cos(math.pi * progress))

    elif name == "WarmupPolyLR":  # used by DeepLab project
        power = getattr(cfg.SOLVER, "POLY_LR_POWER", 0.9)
        const_ending = getattr(cfg.SOLVER, "POLY_LR_CONSTANT_ENDING", 0.0)

        def schedule(step):
            poly = (1.0 - jnp.clip(step / max(max_iter, 1), 0.0, 1.0)) ** power
            poly = jnp.maximum(poly, const_ending)
            return base_lr * warmup(step) * poly

    else:
        raise ValueError(f"Unknown LR scheduler: {name}")

    return schedule


def get_default_optimizer_params(
    params,
    base_lr: float = 0.001,
    weight_decay: float = 1e-4,
    weight_decay_norm: float = 0.0,
    bias_lr_factor: float = 1.0,
    weight_decay_bias: float = None,
):
    """Reference solver/build.py:127 ``get_default_optimizer_params``: the
    per-parameter lr/weight-decay grouping rules (norm params skip wd, biases
    get a lr factor). JAX form: a labels pytree (``regular``/``bias``/``norm``,
    the same labels build_optimizer feeds optax.multi_transform) plus the
    per-group hyperparameters."""
    if weight_decay_bias is None:
        weight_decay_bias = weight_decay
    labels = jax.tree_util.tree_map_with_path(_param_label_fn, params)
    groups = {
        "regular": {"lr": base_lr, "weight_decay": weight_decay},
        "bias": {"lr": base_lr * bias_lr_factor, "weight_decay": weight_decay_bias},
        "norm": {"lr": base_lr, "weight_decay": weight_decay_norm},
    }
    return labels, groups


def _param_label_fn(path: tuple, leaf) -> str:
    """Classify a parameter for per-group overrides: bias / norm / regular.

    Norm parameters in this codebase are named scale/bias inside *Norm
    modules; FrozenBN lives in a non-trainable collection and never reaches
    the optimizer.
    """
    names = [str(p) for p in path]
    joined = "/".join(names).lower()
    if any("norm" in n.lower() or "bn" in n.lower() or "gn" in n.lower() for n in names[:-1]):
        return "norm"
    if names and names[-1] in ("bias",):
        return "bias"
    return "regular"


def build_optimizer(cfg: CfgNode, params) -> optax.GradientTransformation:
    """SGD + momentum (or Adam, per SOLVER.OPTIMIZER — Panoptic-DeepLab's
    build_solver.py uses ADAM) with detectron2's per-group lr/wd rules."""
    schedule = build_lr_schedule(cfg)
    momentum = cfg.SOLVER.MOMENTUM
    nesterov = cfg.SOLVER.NESTEROV
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    bias_lr_factor = cfg.SOLVER.BIAS_LR_FACTOR
    optimizer_name = getattr(cfg.SOLVER, "OPTIMIZER", "SGD").upper()

    labels = jax.tree_util.tree_map_with_path(_param_label_fn, params)

    def make_sgd(weight_decay: float, lr_factor: float):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if optimizer_name == "ADAM":
            chain.append(optax.scale_by_adam())
        else:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        chain.append(
            optax.scale_by_schedule(lambda step: -schedule(step) * lr_factor)
        )
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {
            "regular": make_sgd(wd, 1.0),
            "bias": make_sgd(wd_bias, bias_lr_factor),
            "norm": make_sgd(wd_norm, 1.0),
        },
        labels,
    )

    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        if cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "value":
            clip = optax.clip(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        elif cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "full_model":
            # whole-model global-norm clip (the reference's optional
            # global_clipper path, solver/build.py:60 "for future use with
            # detr"). Preserves the gradient DIRECTION across tensors —
            # per-parameter clipping instead normalizes each tensor
            # individually, which at small CLIP_VALUE degenerates into
            # per-tensor normalized-gradient descent (loss scale stops
            # mattering); the delicate WSDDN MIL sharpening in the JTSM
            # gate diverges under that but trains well under a global clip.
            clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = clip_per_param_norm(
                cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE,
                cfg.SOLVER.CLIP_GRADIENTS.NORM_TYPE,
            )
        tx = optax.chain(clip, tx)
    return tx


def clip_per_param_norm(max_norm: float, norm_type: float = 2.0):
    """Per-parameter p-norm gradient clipping.

    The reference's ``CLIP_TYPE: norm`` applies ``torch.nn.utils
    .clip_grad_norm_(p, CLIP_VALUE, NORM_TYPE)`` to each parameter tensor
    individually (solver/build.py:56-58 iterates params and calls the
    clipper per tensor) — NOT a global-norm clip. Matches torch's
    ``clip_coef = max_norm / (norm + 1e-6)`` clamped at 1.
    """
    max_norm = float(max_norm)
    norm_type = float(norm_type)

    def update_fn(updates, state, params=None):
        del params

        def clip_leaf(g):
            gf = g.astype(jnp.float32)
            if norm_type == float("inf"):
                n = jnp.max(jnp.abs(gf))
            else:
                n = jnp.sum(jnp.abs(gf) ** norm_type) ** (1.0 / norm_type)
            scale = jnp.minimum(1.0, max_norm / (n + 1e-6))
            return (gf * scale).astype(g.dtype)

        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


# reference name (solver/build.py:198 ``build_lr_scheduler``); the schedule
# is a pure step -> lr function folded into the optax chain here
build_lr_scheduler = build_lr_schedule

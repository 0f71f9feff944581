"""Meta-architecture registry (reference: detectron2/modeling/meta_arch/build.py:23)."""

from __future__ import annotations

from ...config import CfgNode
from ...utils.registry import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")


def build_model(cfg: CfgNode):
    """Returns the flax Module for cfg.MODEL.META_ARCHITECTURE. Parameters are
    created separately via ``module.init`` (functional JAX style) — device
    placement is XLA's job, so there is no ``.to(device)`` here."""
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    cls_ = META_ARCH_REGISTRY.get(meta_arch)
    return cls_(**cls_.from_config(cfg))

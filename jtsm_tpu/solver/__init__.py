from .lr_scheduler import WarmupCosineLR, WarmupMultiStepLR, WarmupPolyLR
from .build import (
    build_lr_schedule,
    build_lr_scheduler,
    build_optimizer,
    get_default_optimizer_params,
)

__all__ = [
    "WarmupCosineLR",
    "WarmupMultiStepLR",
    "WarmupPolyLR",
    "build_lr_schedule",
    "build_lr_scheduler",
    "build_optimizer",
    "get_default_optimizer_params",
]

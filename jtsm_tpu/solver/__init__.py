from .build import (
    build_lr_schedule,
    build_lr_scheduler,
    build_optimizer,
    get_default_optimizer_params,
)

__all__ = [
    "build_lr_schedule",
    "build_lr_scheduler",
    "build_optimizer",
    "get_default_optimizer_params",
]

from .config import add_wsl_config


def register_all():
    """Import WSL modules so registries are populated."""
    from .modeling import (  # noqa: F401
        mask_head_wsl,
        meta_arch,
        resnet_wsl,
        roi_heads_jtsm,
        roi_heads_wsl,
        rpn_wsl,
        seg_heads,
        vgg,
        wsjds,
        wsod_zoo,
    )


register_all()

from . import builtin as _builtin  # noqa: E402

_builtin.register_all()

__all__ = ["add_wsl_config"]

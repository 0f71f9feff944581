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

# reference wsl/__init__.py exports the backbone builders at package level
from .modeling import (  # noqa: E402
    build_mrrp_vgg_backbone,
    build_mrrp_wsl_resnet_backbone,
    build_vgg_backbone,
    build_wsl_resnet_backbone,
    build_wsl_resnet_v2_backbone,
)

__all__ = [
    "add_wsl_config",
    "build_mrrp_vgg_backbone",
    "build_mrrp_wsl_resnet_backbone",
    "build_vgg_backbone",
    "build_wsl_resnet_backbone",
    "build_wsl_resnet_v2_backbone",
]

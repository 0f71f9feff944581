from .config import add_wsl_config


def register_all():
    """Import WSL modules so registries are populated."""
    from .modeling import meta_arch, roi_heads_jtsm, roi_heads_wsl, vgg  # noqa: F401


register_all()

__all__ = ["add_wsl_config"]

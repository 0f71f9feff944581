from .cfgnode import CfgNode, configurable
from .compat import downgrade_config, upgrade_config
from .defaults import get_cfg

# A global config object that downstream code can read without threading cfg
# through every call (reference config/config.py:54 `global_cfg` /
# `set_global_cfg`). Use sparingly.
global_cfg = CfgNode()


def set_global_cfg(cfg: CfgNode) -> None:
    """Replace the contents of the module-level ``global_cfg`` (reference
    config/config.py:58 — lets deeply nested code read experiment-global
    options without plumbing)."""
    global_cfg.clear()
    global_cfg.update(cfg)


__all__ = [
    "CfgNode",
    "configurable",
    "downgrade_config",
    "get_cfg",
    "global_cfg",
    "set_global_cfg",
    "upgrade_config",
]

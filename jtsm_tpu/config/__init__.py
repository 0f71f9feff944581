from .cfgnode import CfgNode, configurable
from .defaults import get_cfg

__all__ = ["CfgNode", "configurable", "get_cfg"]

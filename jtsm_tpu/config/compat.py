"""Config version migration (reference: detectron2/config/compat.py — 229
LoC of up/downgrade converters between cfg VERSIONs)."""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

from .cfgnode import CfgNode

logger = logging.getLogger(__name__)

_CURRENT_VERSION = 2


def upgrade_config(cfg: CfgNode, to_version: Optional[int] = None) -> CfgNode:
    cfg = cfg.clone()
    if to_version is None:
        to_version = _CURRENT_VERSION
    assert cfg.VERSION <= to_version, (cfg.VERSION, to_version)
    for k in range(cfg.VERSION, to_version):
        converter = globals()[f"ConverterV{k + 1}"]
        converter.upgrade(cfg)
        cfg.VERSION = k + 1
    return cfg


def downgrade_config(cfg: CfgNode, to_version: int) -> CfgNode:
    cfg = cfg.clone()
    assert cfg.VERSION >= to_version, (cfg.VERSION, to_version)
    for k in range(cfg.VERSION, to_version, -1):
        converter = globals()[f"ConverterV{k}"]
        converter.downgrade(cfg)
        cfg.VERSION = k - 1
    return cfg


def guess_version(cfg: CfgNode, filename: str = "") -> int:
    """Reference compat.py guess_version: V1 configs keyed RPN under
    MODEL.RPN_HEAD."""
    if "VERSION" in cfg and isinstance(cfg.VERSION, int):
        return cfg.VERSION

    def has(name: str) -> bool:
        cur = cfg
        for n in name.split("."):
            if n not in cur:
                return False
            cur = cur[n]
        return True

    if has("MODEL.RPN_HEAD.NAME") or has("MODEL.WEIGHT"):
        ret = 1
    else:
        ret = _CURRENT_VERSION
    logger.warning(f"Config '{filename}' has no VERSION. Assuming it to be v{ret}.")
    return ret


class _RenameConverter:
    RENAME: List[Tuple[str, str]] = []

    @classmethod
    def _rename(cls, cfg: CfgNode, old: str, new: str) -> None:
        old_keys = old.split(".")
        new_keys = new.split(".")
        node = cfg
        for k in old_keys[:-1]:
            if k not in node:
                return
            node = node[k]
        if old_keys[-1] not in node:
            return
        value = node[old_keys[-1]]
        del node[old_keys[-1]]
        dst = cfg
        for k in new_keys[:-1]:
            if k not in dst:
                dst[k] = CfgNode()
            dst = dst[k]
        dst[new_keys[-1]] = value

    @classmethod
    def upgrade(cls, cfg: CfgNode) -> None:
        for old, new in cls.RENAME:
            cls._rename(cfg, old, new)

    @classmethod
    def downgrade(cls, cfg: CfgNode) -> None:
        for old, new in cls.RENAME:
            cls._rename(cfg, new, old)


class ConverterV1(_RenameConverter):
    RENAME = [("MODEL.RPN_HEAD.NAME", "MODEL.RPN.HEAD_NAME")]


class ConverterV2(_RenameConverter):
    """V1 -> V2: the reference renamed several RPN/RETINANET keys."""

    RENAME = [
        ("MODEL.WEIGHT", "MODEL.WEIGHTS"),
        ("MODEL.PANOPTIC_FPN.SEMANTIC_LOSS_SCALE", "MODEL.SEM_SEG_HEAD.LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.RPN_LOSS_SCALE", "MODEL.RPN.LOSS_WEIGHT"),
        (
            "MODEL.PANOPTIC_FPN.INSTANCE_LOSS_SCALE",
            "MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT",
        ),
        ("MODEL.PANOPTIC_FPN.COMBINE_ON", "MODEL.PANOPTIC_FPN.COMBINE.ENABLED"),
        (
            "MODEL.PANOPTIC_FPN.COMBINE_OVERLAP_THRESHOLD",
            "MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH",
        ),
        (
            "MODEL.PANOPTIC_FPN.COMBINE_STUFF_AREA_LIMIT",
            "MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT",
        ),
        (
            "MODEL.PANOPTIC_FPN.COMBINE_INSTANCES_CONFIDENCE_THRESHOLD",
            "MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH",
        ),
    ]

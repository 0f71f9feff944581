"""RPN for weakly-supervised detection (reference:
projects/WSL/wsl/modeling/proposal_generator/rpn.py:27 ``StandardRPNHeadWSL``,
:102 ``RPNWSL``).

Two deltas vs the core RPN:
- MRRP support (reference :414): when the backbone is a multi-rate receptive
  pyramid (MRRPConv), each feature folds ``num_branch`` branches into the
  batch dim ((B*N, H, W, C)); the RPN splits them back and treats every
  branch as an extra pyramid level sharing anchors and ground truth.
- Trained from mined pseudo ground truth: the caller (UWSOD meta-arch /
  trainer) passes PGT boxes as ``gt_boxes``; this class itself is agnostic
  (the core RPN loss already accepts arbitrary gt).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...layers import ShapeSpec
from ...modeling.proposal_generator.rpn import (
    PROPOSAL_GENERATOR_REGISTRY,
    RPN,
)

Array = jax.Array


@PROPOSAL_GENERATOR_REGISTRY.register()
class RPNWSL(nn.Module):
    """Core RPN over MRRP-expanded features (reference rpn.py:102)."""

    rpn: RPN
    base_in_features: Sequence[str]
    mrrp_num_branch: int = 1

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: Dict[str, ShapeSpec]):
        base = tuple(cfg.MODEL.RPN.IN_FEATURES)
        nb = cfg.MODEL.MRRP.NUM_BRANCH if cfg.MODEL.MRRP.MRRP_ON else 1
        if nb > 1:
            shapes = {}
            names = []
            for f in base:
                s = input_shape[f]
                for i in range(nb):
                    name = f"{f}/mrrp{i}"
                    shapes[name] = ShapeSpec(channels=s.channels, stride=s.stride)
                    names.append(name)
            sub = cfg.clone()
            sub.defrost()
            sub.MODEL.RPN.IN_FEATURES = names
            rpn = RPN(**RPN.from_config(sub, shapes))
        else:
            rpn = RPN(**RPN.from_config(cfg, input_shape))
        return dict(rpn=rpn, base_in_features=base, mrrp_num_branch=nb)

    def __call__(
        self,
        image_sizes: Array,
        features: Dict[str, Array],
        gt_boxes: Optional[Array] = None,
        gt_valid: Optional[Array] = None,
        train: bool = False,
        defer_losses: bool = False,
    ):
        if self.mrrp_num_branch > 1:
            expanded = {}
            for f in self.base_in_features:
                x = features[f]
                nb = self.mrrp_num_branch if x.shape[0] > image_sizes.shape[0] else 1
                chunks = jnp.split(x, nb, axis=0)
                for i, ch in enumerate(chunks):
                    expanded[f"{f}/mrrp{i}"] = ch
                # at test time a single branch runs (TEST_BRANCH_IDX != -1):
                # reuse it for the remaining level slots so shapes stay static
                for i in range(nb, self.mrrp_num_branch):
                    expanded[f"{f}/mrrp{i}"] = chunks[0]
            features = expanded
        return self.rpn(
            image_sizes, features, gt_boxes, gt_valid, train=train, defer_losses=defer_losses
        )

    def get_losses(self, rng, deferred, gt_boxes, gt_valid):
        return self.rpn.get_losses(rng, deferred, gt_boxes, gt_valid)

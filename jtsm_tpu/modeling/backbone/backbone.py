"""Backbone contract (reference: detectron2/modeling/backbone/backbone.py).

A backbone is a flax Module mapping an NHWC image batch to a dict of NHWC
feature maps, and exposing ``output_shape()`` statically (computed from
config, not params)."""

from __future__ import annotations

from typing import Dict

import flax.linen as nn

from ...layers import ShapeSpec


class Backbone(nn.Module):
    @property
    def size_divisibility(self) -> int:
        return 0

    def output_shape(self) -> Dict[str, ShapeSpec]:
        raise NotImplementedError

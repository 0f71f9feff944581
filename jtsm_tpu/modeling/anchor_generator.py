"""Anchor generation (reference: detectron2/modeling/anchor_generator.py:81
``DefaultAnchorGenerator``, :230 ``RotatedAnchorGenerator``).

Anchors are pure functions of static feature shapes — computed with numpy at
trace time and baked into the graph as constants (the reference keeps them as
buffers; same effect)."""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode, configurable
from ..layers import ShapeSpec
from ..utils.registry import Registry

ANCHOR_GENERATOR_REGISTRY = Registry("ANCHOR_GENERATOR")

Array = jax.Array


def _broadcast_params(params, num_features: int, name: str):
    assert isinstance(params, (list, tuple)), f"{name} must be a list"
    assert len(params), f"{name} is empty"
    if not isinstance(params[0], (list, tuple)):
        return [list(params)] * num_features
    if len(params) == 1:
        return list(params) * num_features
    assert len(params) == num_features, (
        f"Got {name} of length {len(params)} for {num_features} features!"
    )
    return [list(p) for p in params]


def generate_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1, 2),
) -> np.ndarray:
    """(A, 4) XYXY anchors centered at (0, 0) (reference :154)."""
    anchors = []
    for size in sizes:
        area = size**2.0
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, dtype=np.float32)


def _create_grid_offsets(size: Tuple[int, int], stride: int, offset: float):
    h, w = size
    shifts_x = (np.arange(w, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(h, dtype=np.float32) + offset) * stride
    shift_x, shift_y = np.meshgrid(shifts_x, shifts_y)
    return shift_x.reshape(-1), shift_y.reshape(-1)


class DefaultAnchorGenerator:
    box_dim = 4

    @configurable
    def __init__(self, *, sizes, aspect_ratios, strides, offset=0.0):
        self.strides = list(strides)
        num_features = len(self.strides)
        sizes = _broadcast_params(sizes, num_features, "sizes")
        aspect_ratios = _broadcast_params(aspect_ratios, num_features, "aspect_ratios")
        self.cell_anchors = [
            generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]
        self.offset = offset

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: List[ShapeSpec]):
        return {
            "sizes": cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            "aspect_ratios": cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            "strides": [x.stride for x in input_shape],
            "offset": cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        }

    @property
    def num_anchors(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    @property
    def num_cell_anchors(self) -> List[int]:
        return self.num_anchors

    def __call__(self, grid_sizes: List[Tuple[int, int]]) -> List[Array]:
        """grid_sizes: static (Hi, Wi) per level -> list of (Hi*Wi*A, 4)."""
        anchors = []
        for size, stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            sx, sy = _create_grid_offsets(size, stride, self.offset)
            shifts = np.stack([sx, sy, sx, sy], axis=1)  # (HW, 4)
            a = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
            anchors.append(jnp.asarray(a))
        return anchors


ANCHOR_GENERATOR_REGISTRY._do_register("DefaultAnchorGenerator", DefaultAnchorGenerator)


class RotatedAnchorGenerator:
    """Reference anchor_generator.py:230 — 5-param anchors with angles."""

    box_dim = 5

    @configurable
    def __init__(self, *, sizes, aspect_ratios, strides, angles, offset=0.0):
        self.strides = list(strides)
        num_features = len(self.strides)
        sizes = _broadcast_params(sizes, num_features, "sizes")
        aspect_ratios = _broadcast_params(aspect_ratios, num_features, "aspect_ratios")
        angles = _broadcast_params(angles, num_features, "angles")
        self.cell_anchors = [
            self._cell_anchors(s, a, ang)
            for s, a, ang in zip(sizes, aspect_ratios, angles)
        ]
        self.offset = offset

    @classmethod
    def from_config(cls, cfg: CfgNode, input_shape: List[ShapeSpec]):
        return {
            "sizes": cfg.MODEL.ANCHOR_GENERATOR.SIZES,
            "aspect_ratios": cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS,
            "strides": [x.stride for x in input_shape],
            "angles": cfg.MODEL.ANCHOR_GENERATOR.ANGLES,
            "offset": cfg.MODEL.ANCHOR_GENERATOR.OFFSET,
        }

    @staticmethod
    def _cell_anchors(sizes, aspect_ratios, angles) -> np.ndarray:
        anchors = []
        for size in sizes:
            area = size**2.0
            for ar in aspect_ratios:
                w = math.sqrt(area / ar)
                h = ar * w
                anchors.extend([0, 0, w, h, a] for a in angles)
        return np.asarray(anchors, dtype=np.float32)

    @property
    def num_anchors(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def __call__(self, grid_sizes: List[Tuple[int, int]]) -> List[Array]:
        anchors = []
        for size, stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            sx, sy = _create_grid_offsets(size, stride, self.offset)
            zeros = np.zeros_like(sx)
            shifts = np.stack([sx, sy, zeros, zeros, zeros], axis=1)
            a = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 5)
            anchors.append(jnp.asarray(a))
        return anchors


ANCHOR_GENERATOR_REGISTRY._do_register("RotatedAnchorGenerator", RotatedAnchorGenerator)


def build_anchor_generator(cfg: CfgNode, input_shape: List[ShapeSpec]):
    name = cfg.MODEL.ANCHOR_GENERATOR.NAME
    return ANCHOR_GENERATOR_REGISTRY.get(name)(cfg, input_shape)

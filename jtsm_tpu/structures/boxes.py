"""Boxes: functional ops on (..., 4) XYXY arrays + a thin pytree wrapper.

TPU-native re-design of the reference box structures
(reference: detectron2/structures/boxes.py:23 ``BoxMode``, :143 ``Boxes``,
:369 ``pairwise_iou``). The core is *functional*: plain ``jnp`` ops that jit
and vmap cleanly; the ``Boxes`` class is a registered pytree wrapper kept for
API parity with the reference.
"""

from __future__ import annotations

import math
from enum import IntEnum, unique
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_RawBoxType = Union[Array, np.ndarray, list, tuple]


@unique
class BoxMode(IntEnum):
    """Reference: detectron2/structures/boxes.py:23."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box: _RawBoxType, from_mode: "BoxMode", to_mode: "BoxMode") -> _RawBoxType:
        if from_mode == to_mode:
            return box

        original_type = type(box)
        is_numpy = isinstance(box, (np.ndarray, jnp.ndarray, jax.Array))
        single_box = isinstance(box, (list, tuple))
        if single_box:
            assert len(box) == 4 or len(box) == 5, (
                "BoxMode.convert takes either a k-tuple/list or an Nxk array/tensor "
                "where k == 4 or 5"
            )
            arr = np.array(box, dtype=np.float64)[None, :]
        else:
            arr = np.asarray(box, dtype=np.float64) if not isinstance(box, jax.Array) else box

        assert to_mode not in (BoxMode.XYXY_REL, BoxMode.XYWH_REL) and from_mode not in (
            BoxMode.XYXY_REL,
            BoxMode.XYWH_REL,
        ), "Relative mode not yet supported!"

        xp = jnp if isinstance(arr, jax.Array) else np

        if from_mode == to_mode:
            out = arr
        elif from_mode == BoxMode.XYWHA_ABS and to_mode == BoxMode.XYXY_ABS:
            assert arr.shape[-1] == 5, "The last dimension of input shape must be 5 for XYWHA format"
            cx, cy, w, h, a = (arr[..., i] for i in range(5))
            theta = a * math.pi / 180.0
            c = xp.abs(xp.cos(theta))
            s = xp.abs(xp.sin(theta))
            new_w = c * w + s * h
            new_h = c * h + s * w
            out = xp.stack(
                [cx - new_w / 2.0, cy - new_h / 2.0, cx + new_w / 2.0, cy + new_h / 2.0],
                axis=-1,
            )
        elif from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYWHA_ABS:
            x, y, w, h = (arr[..., i] for i in range(4))
            out = xp.stack([x + w / 2.0, y + h / 2.0, w, h, xp.zeros_like(x)], axis=-1)
        elif to_mode == BoxMode.XYXY_ABS and from_mode == BoxMode.XYWH_ABS:
            x, y, w, h = (arr[..., i] for i in range(4))
            out = xp.stack([x, y, x + w, y + h], axis=-1)
        elif from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            x0, y0, x1, y1 = (arr[..., i] for i in range(4))
            out = xp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)
        else:
            raise NotImplementedError(
                f"Conversion from BoxMode {from_mode} to {to_mode} is not supported yet"
            )

        if single_box:
            return original_type(out[0].tolist())
        if is_numpy and not isinstance(box, jax.Array):
            return np.asarray(out, dtype=np.asarray(box).dtype)
        return out


# ---------------------------------------------------------------------------
# Functional core (jit/vmap friendly)
# ---------------------------------------------------------------------------


def box_area(boxes: Array) -> Array:
    """Area of (..., 4) XYXY boxes (reference boxes.py:161)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def clip_boxes(boxes: Array, box_size: Tuple[int, int] | Array) -> Array:
    """Clip to [0, w] x [0, h]; ``box_size`` is (h, w) (reference boxes.py:185)."""
    h, w = box_size[0], box_size[1]
    x0 = jnp.clip(boxes[..., 0], 0, w)
    y0 = jnp.clip(boxes[..., 1], 0, h)
    x1 = jnp.clip(boxes[..., 2], 0, w)
    y1 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nonempty_boxes(boxes: Array, threshold: float = 0.0) -> Array:
    """Bool mask of boxes with both sides > threshold (reference boxes.py:199)."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


def boxes_inside_box(boxes: Array, box_size: Tuple[int, int], boundary_threshold: float = 0.0) -> Array:
    """Reference boxes.py:236 ``inside_box``."""
    h, w = box_size
    return (
        (boxes[..., 0] >= -boundary_threshold)
        & (boxes[..., 1] >= -boundary_threshold)
        & (boxes[..., 2] < w + boundary_threshold)
        & (boxes[..., 3] < h + boundary_threshold)
    )


def box_centers(boxes: Array) -> Array:
    return (boxes[..., :2] + boxes[..., 2:4]) / 2.0


def scale_boxes(boxes: Array, scale_x: float, scale_y: float) -> Array:
    return boxes * jnp.asarray([scale_x, scale_y, scale_x, scale_y], dtype=boxes.dtype)


def pairwise_intersection(boxes1: Array, boxes2: Array) -> Array:
    """(N, 4) x (M, 4) -> (N, M) intersection areas (reference boxes.py:345)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """(N, 4) x (M, 4) -> (N, M) IoU (reference boxes.py:369)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1: Array, boxes2: Array) -> Array:
    """Intersection over the area of boxes2 (reference boxes.py:394)."""
    area2 = box_area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / jnp.maximum(area2[None, :], 1e-12), 0.0)


def matched_pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """Element-wise IoU of aligned (N, 4) arrays (reference boxes.py:414
    ``matched_boxlist_iou``)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, :2], boxes2[:, :2])
    rb = jnp.minimum(boxes1[:, 2:4], boxes2[:, 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    return jnp.where(inter > 0, inter / jnp.maximum(area1 + area2 - inter, 1e-12), 0.0)


# ---------------------------------------------------------------------------
# Wrapper class (API parity)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class Boxes:
    """N x 4 XYXY box container (reference boxes.py:143). A registered pytree:
    it can flow through jit/vmap; all math delegates to the functional core."""

    def __init__(self, tensor: Array):
        if not isinstance(tensor, jax.Array):
            tensor = jnp.asarray(tensor, dtype=jnp.float32)
            if tensor.size == 0:
                tensor = tensor.reshape((0, 4))
        assert tensor.ndim == 2 and tensor.shape[-1] == 4, tensor.shape
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def clone(self) -> "Boxes":
        return Boxes(self.tensor)

    def to(self, *args, **kwargs) -> "Boxes":
        return self  # device placement is managed by jax, kept for API parity

    def area(self) -> Array:
        return box_area(self.tensor)

    def clip(self, box_size: Tuple[int, int]) -> "Boxes":
        return Boxes(clip_boxes(self.tensor, box_size))

    def nonempty(self, threshold: float = 0.0) -> Array:
        return nonempty_boxes(self.tensor, threshold)

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0) -> Array:
        return boxes_inside_box(self.tensor, box_size, boundary_threshold)

    def get_centers(self) -> Array:
        return box_centers(self.tensor)

    def scale(self, scale_x: float, scale_y: float) -> "Boxes":
        return Boxes(scale_boxes(self.tensor, scale_x, scale_y))

    def __getitem__(self, item) -> "Boxes":
        if isinstance(item, int):
            return Boxes(self.tensor[item : item + 1])
        b = self.tensor[item]
        return Boxes(b)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return f"Boxes({self.tensor})"

    @classmethod
    def cat(cls, boxes_list) -> "Boxes":
        assert all(isinstance(b, Boxes) for b in boxes_list)
        if len(boxes_list) == 0:
            return cls(jnp.zeros((0, 4), dtype=jnp.float32))
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

    @property
    def device(self):
        return self.tensor.devices()


def unique_boxes(boxes: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Indices of unique boxes (fork addition, reference boxes.py:226).
    Host-side helper used by proposal loading; operates on numpy."""
    boxes = np.asarray(boxes)
    hashes = np.round(boxes * scale).dot([1, 1e3, 1e6, 1e9])
    _, index = np.unique(hashes, return_index=True)
    return np.sort(index)


# API-compat alias (the reference calls it matched_boxlist_iou)
matched_boxlist_iou = matched_pairwise_iou

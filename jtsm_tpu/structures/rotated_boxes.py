"""Rotated boxes: (cx, cy, w, h, angle_deg) + exact rotated IoU in pure JAX.

Reference: detectron2/structures/rotated_boxes.py (``RotatedBoxes``) and the
native op `layers/csrc/box_iou_rotated/` (exact polygon-intersection rotated
IoU). TPU re-design: the CUDA polygon-clipping kernel becomes a vectorized
Sutherland–Hodgman clip with a static vertex capacity (two convex quads
intersect in <= 8 vertices), vmapped over all pairs — branch-free and
MXU/VPU friendly.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_MAX_VERTS = 8


def rotated_box_corners(boxes: Array) -> Array:
    """(..., 5) -> (..., 4, 2) corner coordinates (counter-clockwise).
    Angle convention follows the reference: degrees, counter-clockwise."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    theta = a * (math.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = w / 2.0
    dy = h / 2.0
    # corners in local frame (ccw): (+dx,+dy), (-dx,+dy), (-dx,-dy), (+dx,-dy)
    local = jnp.stack(
        [
            jnp.stack([dx, dy], axis=-1),
            jnp.stack([-dx, dy], axis=-1),
            jnp.stack([-dx, -dy], axis=-1),
            jnp.stack([dx, -dy], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    # rotate by theta (y axis points up in this convention, matching ref kernel)
    rot_x = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    rot_y = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return jnp.stack([rot_x + cx[..., None], rot_y + cy[..., None]], axis=-1)


def _clip_polygon_by_halfplane(verts: Array, count: Array, p0: Array, p1: Array):
    """Clip polygon (capacity _MAX_VERTS) by the half-plane left of edge p0->p1.

    Static-shape Sutherland–Hodgman step: for each slot we compute whether
    the vertex and its successor are inside, emit up to 2 points per edge into
    a 2*_MAX_VERTS scratch, then compact with a prefix-sum gather.
    """
    cap = verts.shape[0]
    edge = p1 - p0
    idx = jnp.arange(cap)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    v_cur = verts
    v_nxt = verts[nxt]

    def side(v):
        rel = v - p0
        return edge[0] * rel[..., 1] - edge[1] * rel[..., 0]

    s_cur = side(v_cur)
    s_nxt = side(v_nxt)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0

    denom = s_cur - s_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = v_cur + (v_nxt - v_cur) * t[:, None]

    active = idx < count
    emit_cur = in_cur & active
    emit_int = (in_cur ^ in_nxt) & active

    # interleave: slot 2i = current vertex (if kept), slot 2i+1 = intersection
    emits = jnp.zeros((2 * cap,), dtype=bool)
    emits = emits.at[0::2].set(emit_cur)
    emits = emits.at[1::2].set(emit_int)
    pts = jnp.zeros((2 * cap, 2), dtype=verts.dtype)
    pts = pts.at[0::2].set(v_cur)
    pts = pts.at[1::2].set(inter)

    # compact via stable sort: emitted slots first, in original order
    new_count = jnp.sum(emits.astype(jnp.int32))
    order = jnp.argsort(~emits, stable=True)
    out = pts[order[:cap]]
    return out, jnp.minimum(new_count, cap)


def _polygon_area(verts: Array, count: Array) -> Array:
    cap = verts.shape[0]
    idx = jnp.arange(cap)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    active = (idx < count).astype(verts.dtype)
    x, y = verts[:, 0], verts[:, 1]
    xn, yn = verts[nxt, 0], verts[nxt, 1]
    cross = (x * yn - xn * y) * active
    return 0.5 * jnp.abs(jnp.sum(cross))


def _pair_intersection_area(corners1: Array, corners2: Array) -> Array:
    """Intersection area of two convex quads given as (4, 2) ccw corners."""
    verts = jnp.zeros((_MAX_VERTS, 2), dtype=corners1.dtype)
    verts = verts.at[:4].set(corners1)
    count = jnp.asarray(4, dtype=jnp.int32)
    for k in range(4):
        p0 = corners2[k]
        p1 = corners2[(k + 1) % 4]
        verts, count = _clip_polygon_by_halfplane(verts, count, p0, p1)
    area = _polygon_area(verts, count)
    return jnp.where(count >= 3, area, 0.0)


def pairwise_iou_rotated(boxes1: Array, boxes2: Array) -> Array:
    """Exact rotated IoU, (N, 5) x (M, 5) -> (N, M).

    Reference: `layers/csrc/box_iou_rotated/box_iou_rotated_utils.h` —
    re-expressed as vmapped polygon clipping.
    """
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    c1 = rotated_box_corners(boxes1)  # (N, 4, 2)
    c2 = rotated_box_corners(boxes2)  # (M, 4, 2)
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]

    inter = jax.vmap(
        lambda ca: jax.vmap(lambda cb: _pair_intersection_area(ca, cb))(c2)
    )(c1)
    union = area1[:, None] + area2[None, :] - inter
    iou = jnp.where(union > 1e-12, inter / jnp.maximum(union, 1e-12), 0.0)
    return jnp.clip(iou, 0.0, 1.0)


@jax.tree_util.register_pytree_node_class
class RotatedBoxes:
    """N x 5 (cx, cy, w, h, angle) container (reference rotated_boxes.py)."""

    def __init__(self, tensor: Array):
        if not isinstance(tensor, jax.Array):
            tensor = jnp.asarray(tensor, dtype=jnp.float32)
            if tensor.size == 0:
                tensor = tensor.reshape((0, 5))
        assert tensor.ndim == 2 and tensor.shape[-1] == 5, tensor.shape
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def clone(self) -> "RotatedBoxes":
        return RotatedBoxes(self.tensor)

    def to(self, *args, **kwargs) -> "RotatedBoxes":
        return self

    def area(self) -> Array:
        return self.tensor[:, 2] * self.tensor[:, 3]

    def normalize_angles(self) -> "RotatedBoxes":
        a = (self.tensor[:, 4] + 180.0) % 360.0 - 180.0
        return RotatedBoxes(self.tensor.at[:, 4].set(a))

    def clip(self, box_size: Tuple[int, int], clip_angle_threshold: float = 1.0) -> "RotatedBoxes":
        """Only clip nearly-axis-aligned boxes, like the reference."""
        h, w = box_size
        t = self.tensor
        a = (t[:, 4] + 180.0) % 360.0 - 180.0
        nearly_aligned = jnp.abs(a) <= clip_angle_threshold
        x1 = t[:, 0] - t[:, 2] / 2.0
        y1 = t[:, 1] - t[:, 3] / 2.0
        x2 = t[:, 0] + t[:, 2] / 2.0
        y2 = t[:, 1] + t[:, 3] / 2.0
        x1c = jnp.clip(x1, 0, w)
        y1c = jnp.clip(y1, 0, h)
        x2c = jnp.clip(x2, 0, w)
        y2c = jnp.clip(y2, 0, h)
        new = jnp.stack(
            [(x1c + x2c) / 2, (y1c + y2c) / 2, x2c - x1c, y2c - y1c, t[:, 4]], axis=-1
        )
        out = jnp.where(nearly_aligned[:, None], new, t)
        return RotatedBoxes(out)

    def nonempty(self, threshold: float = 0.0) -> Array:
        return (self.tensor[:, 2] > threshold) & (self.tensor[:, 3] > threshold)

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: float = 0.0) -> Array:
        h, w = box_size
        cx, cy = self.tensor[:, 0], self.tensor[:, 1]
        return (
            (cx >= -boundary_threshold)
            & (cy >= -boundary_threshold)
            & (cx < w + boundary_threshold)
            & (cy < h + boundary_threshold)
        )

    def get_centers(self) -> Array:
        return self.tensor[:, :2]

    def scale(self, scale_x: float, scale_y: float) -> "RotatedBoxes":
        t = self.tensor
        theta = t[:, 4] * (math.pi / 180.0)
        c, s = jnp.cos(theta), jnp.sin(theta)
        cx = t[:, 0] * scale_x
        cy = t[:, 1] * scale_y
        w = t[:, 2] * jnp.sqrt((scale_x * c) ** 2 + (scale_y * s) ** 2)
        h = t[:, 3] * jnp.sqrt((scale_x * s) ** 2 + (scale_y * c) ** 2)
        angle = jnp.arctan2(scale_x * s, scale_y * c) * (180.0 / math.pi)
        return RotatedBoxes(jnp.stack([cx, cy, w, h, angle], axis=-1))

    def __getitem__(self, item) -> "RotatedBoxes":
        if isinstance(item, int):
            return RotatedBoxes(self.tensor[item : item + 1])
        return RotatedBoxes(self.tensor[item])

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __repr__(self) -> str:
        return f"RotatedBoxes({self.tensor})"

    @classmethod
    def cat(cls, boxes_list: List["RotatedBoxes"]) -> "RotatedBoxes":
        if len(boxes_list) == 0:
            return cls(jnp.zeros((0, 5), dtype=jnp.float32))
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))

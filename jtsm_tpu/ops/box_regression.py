"""Box delta encoding/decoding (reference: detectron2/modeling/box_regression.py:16
``Box2BoxTransform``, :115 rotated variant). Pure functions + a small
stateless class holding the weights."""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


class Box2BoxTransform:
    def __init__(
        self,
        weights: Tuple[float, float, float, float],
        scale_clamp: float = _DEFAULT_SCALE_CLAMP,
    ):
        self.weights = tuple(weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: Array, target_boxes: Array) -> Array:
        """dx, dy, dw, dh encoding of target w.r.t. src (both (..., 4) XYXY)."""
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        eps = 1e-7
        src_w = jnp.maximum(src_w, eps)
        src_h = jnp.maximum(src_h, eps)
        dx = wx * (tgt_cx - src_cx) / src_w
        dy = wy * (tgt_cy - src_cy) / src_h
        dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / src_w)
        dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / src_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: Array, boxes: Array) -> Array:
        """deltas: (..., k*4); boxes: (..., 4) -> (..., k*4) decoded XYXY."""
        boxes = boxes.astype(deltas.dtype)
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        shp = deltas.shape[:-1] + (-1, 4)
        d = deltas.reshape(shp)
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(d[..., 3] / wh, self.scale_clamp)

        pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
        pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        out = jnp.stack(
            [
                pred_ctr_x - 0.5 * pred_w,
                pred_ctr_y - 0.5 * pred_h,
                pred_ctr_x + 0.5 * pred_w,
                pred_ctr_y + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(deltas.shape)


class Box2BoxTransformRotated:
    """Rotated (cx, cy, w, h, a) delta codec (reference box_regression.py:115)."""

    def __init__(
        self,
        weights: Tuple[float, float, float, float, float],
        scale_clamp: float = _DEFAULT_SCALE_CLAMP,
    ):
        self.weights = tuple(weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: Array, target_boxes: Array) -> Array:
        s_cx, s_cy, s_w, s_h, s_a = (src_boxes[..., i] for i in range(5))
        t_cx, t_cy, t_w, t_h, t_a = (target_boxes[..., i] for i in range(5))
        wx, wy, ww, wh, wa = self.weights
        dx = wx * (t_cx - s_cx) / s_w
        dy = wy * (t_cy - s_cy) / s_h
        dw = ww * jnp.log(t_w / s_w)
        dh = wh * jnp.log(t_h / s_h)
        da = (t_a - s_a + 180.0) % 360.0 - 180.0
        da = da * wa * (math.pi / 180.0)
        return jnp.stack([dx, dy, dw, dh, da], axis=-1)

    def apply_deltas(self, deltas: Array, boxes: Array) -> Array:
        assert deltas.shape[-1] == 5
        boxes = boxes.astype(deltas.dtype)
        cx, cy, w, h, a = (boxes[..., i] for i in range(5))
        wx, wy, ww, wh, wa = self.weights
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.minimum(deltas[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(deltas[..., 3] / wh, self.scale_clamp)
        da = deltas[..., 4] * (180.0 / math.pi) / wa

        pred_cx = dx * w + cx
        pred_cy = dy * h + cy
        pred_w = jnp.exp(dw) * w
        pred_h = jnp.exp(dh) * h
        pred_a = (da + a + 180.0) % 360.0 - 180.0
        return jnp.stack([pred_cx, pred_cy, pred_w, pred_h, pred_a], axis=-1)

"""Keypoints structure + heatmap codecs (reference: structures/keypoints.py:8,
:84 ``_keypoints_to_heatmap``, :143 ``heatmaps_to_keypoints``)."""

from __future__ import annotations

from typing import Any, List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_pytree_node_class
class Keypoints:
    """(N, K, 3) array of (x, y, visibility)."""

    def __init__(self, keypoints: Union[Array, np.ndarray, list]):
        keypoints = jnp.asarray(keypoints, dtype=jnp.float32)
        assert keypoints.ndim == 3 and keypoints.shape[2] == 3, keypoints.shape
        self.tensor = keypoints

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def to(self, *args, **kwargs) -> "Keypoints":
        return self

    @property
    def device(self):
        return self.tensor.devices()

    def to_heatmap(self, boxes: Array, heatmap_size: int) -> Tuple[Array, Array]:
        return keypoints_to_heatmap(self.tensor, boxes, heatmap_size)

    def __getitem__(self, item) -> "Keypoints":
        if isinstance(item, int):
            return Keypoints(self.tensor[item : item + 1])
        return Keypoints(self.tensor[item])

    def __repr__(self) -> str:
        return f"Keypoints(num_instances={len(self)})"

    @staticmethod
    def cat(keypoints_list: List["Keypoints"]) -> "Keypoints":
        assert len(keypoints_list) > 0
        return Keypoints(jnp.concatenate([k.tensor for k in keypoints_list], axis=0))


def keypoints_to_heatmap(
    keypoints: Array, rois: Array, heatmap_size: int
) -> Tuple[Array, Array]:
    """Encode keypoints into per-ROI discrete heatmap indices.

    Reference: structures/keypoints.py:84. Returns (heatmaps, valid) where
    heatmaps is (N, K) int32 of flattened bin indices and valid is (N, K).
    """
    offset_x = rois[:, 0:1]
    offset_y = rois[:, 1:2]
    scale_x = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    scale_y = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)

    x = keypoints[..., 0]
    y = keypoints[..., 1]

    x_boundary_inds = x == rois[:, 2:3]
    y_boundary_inds = y == rois[:, 3:4]

    x = ((x - offset_x) * scale_x).astype(jnp.int32)
    y = ((y - offset_y) * scale_y).astype(jnp.int32)
    x = jnp.where(x_boundary_inds, heatmap_size - 1, x)
    y = jnp.where(y_boundary_inds, heatmap_size - 1, y)

    valid_loc = (x >= 0) & (y >= 0) & (x < heatmap_size) & (y < heatmap_size)
    vis = keypoints[..., 2] > 0
    valid = (valid_loc & vis).astype(jnp.int32)

    lin_ind = y * heatmap_size + x
    heatmaps = lin_ind * valid
    return heatmaps, valid


def heatmaps_to_keypoints(maps: Array, rois: Array) -> Array:
    """Decode predicted heatmaps to image-space keypoints with scores.

    Reference: structures/keypoints.py:143. ``maps`` is (N, K, S, S) logits;
    returns (N, K, 4): (x, y, logit, prob). Uses argmax on a bilinear-upscaled
    map like the reference (factor derived from ROI size) — here we instead
    compute exact continuous argmax on the raw grid plus half-bin offsets,
    which matches within quantization and keeps shapes static.
    """
    n, k, s, _ = maps.shape
    offset_x = rois[:, 0]
    offset_y = rois[:, 1]
    widths = jnp.clip(rois[:, 2] - rois[:, 0], 1.0)
    heights = jnp.clip(rois[:, 3] - rois[:, 1], 1.0)
    width_corrections = widths / s
    height_corrections = heights / s

    flat = maps.reshape(n, k, s * s)
    idx = jnp.argmax(flat, axis=2)
    max_logit = jnp.take_along_axis(flat, idx[..., None], axis=2)[..., 0]
    probs = jax.nn.softmax(flat, axis=2)
    max_prob = jnp.take_along_axis(probs, idx[..., None], axis=2)[..., 0]

    xs = (idx % s).astype(jnp.float32) + 0.5
    ys = (idx // s).astype(jnp.float32) + 0.5
    x = xs * width_corrections[:, None] + offset_x[:, None]
    y = ys * height_corrections[:, None] + offset_y[:, None]
    return jnp.stack([x, y, max_logit, max_prob], axis=2)

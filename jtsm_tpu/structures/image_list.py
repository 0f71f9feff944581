"""ImageList: batch of padded images with true per-image sizes.

Reference: detectron2/structures/image_list.py:24 (``ImageList``), :71
(``from_tensors``). TPU re-design: images are stored NHWC (TPU-friendly
layout) and padding targets a *static* bucket so the jitted graph has a
bounded set of shapes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_pytree_node_class
class ImageList:
    """tensor: (B, H, W, C) padded batch; image_sizes: (B, 2) int array of
    true (h, w) per image (the reference keeps a python list; an array keeps
    this jit-traceable)."""

    def __init__(self, tensor: Array, image_sizes: Array):
        self.tensor = tensor
        self.image_sizes = (
            image_sizes
            if isinstance(image_sizes, (jax.Array, np.ndarray))
            else jnp.asarray(image_sizes, dtype=jnp.int32)
        )

    def tree_flatten(self):
        return (self.tensor, self.image_sizes), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, idx: int) -> Array:
        size = self.image_sizes[idx]
        return self.tensor[idx, : size[0], : size[1], :]

    def to(self, *args, **kwargs) -> "ImageList":
        return self

    @property
    def device(self):
        return self.tensor.devices()

    @staticmethod
    def from_tensors(
        tensors: Sequence[Array],
        size_divisibility: int = 0,
        pad_value: float = 0.0,
        pad_to: Tuple[int, int] | None = None,
    ) -> "ImageList":
        """Pad a list of (H, W, C) images into one (B, Hp, Wp, C) batch.

        ``pad_to`` pins the padded size to a static bucket (TPU path);
        otherwise the max size rounded up to ``size_divisibility`` is used
        (reference image_list.py:71-110 semantics).
        """
        assert len(tensors) > 0
        image_sizes = [(int(t.shape[0]), int(t.shape[1])) for t in tensors]
        if pad_to is not None:
            max_h, max_w = pad_to
        else:
            max_h = max(s[0] for s in image_sizes)
            max_w = max(s[1] for s in image_sizes)
            if size_divisibility > 1:
                d = size_divisibility
                max_h = (max_h + d - 1) // d * d
                max_w = (max_w + d - 1) // d * d
        padded = []
        for t in tensors:
            h, w = int(t.shape[0]), int(t.shape[1])
            t = jnp.asarray(t)
            padded.append(
                jnp.pad(
                    t,
                    ((0, max_h - h), (0, max_w - w), (0, 0)),
                    constant_values=pad_value,
                )
            )
        batch = jnp.stack(padded, axis=0)
        return ImageList(batch, jnp.asarray(image_sizes, dtype=jnp.int32))

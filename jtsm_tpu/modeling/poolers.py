"""Multi-level region feature extraction (reference:
detectron2/modeling/poolers.py:98 ``ROIPooler``, :22
``assign_boxes_to_levels`` — FPN paper eq. 1).

TPU re-design: the reference scatters boxes into per-level batches and
index_puts the outputs back; here every ROI carries a level id into a single
unified-pyramid gather (`ops.roi_align_multilevel`), so the op is one static
kernel regardless of how boxes distribute across levels.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align_multilevel

Array = jax.Array


def assign_boxes_to_levels(
    boxes: Array,  # (R, 4)
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> Array:
    """FPN paper eq. (1) (reference poolers.py:22)."""
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    sqrt_area = jnp.sqrt(area)
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.maximum(sqrt_area, 1e-8) / canonical_box_size + 1e-8)
    )
    lvl = jnp.clip(lvl, min_level, max_level)
    return (lvl - min_level).astype(jnp.int32)


class ROIPooler:
    """Stateless callable (no params)."""

    def __init__(
        self,
        output_size: int | Tuple[int, int],
        scales: Sequence[float],
        sampling_ratio: int,
        pooler_type: str = "ROIAlignV2",
        canonical_box_size: int = 224,
        canonical_level: int = 4,
        impl: str = "auto",  # "auto" | "pallas" | "xla"
    ):
        self.output_size = (
            (output_size, output_size) if isinstance(output_size, int) else tuple(output_size)
        )
        self.scales = tuple(scales)
        # reference semantics: sampling_ratio=0 means per-ROI adaptive —
        # reproduced exactly by the gather path (ops/roi_align.py adaptive
        # mode). The Pallas resident fast path keeps a fixed ratio of 2 in
        # that case (the deliberate TPU production trade: ≤2px-bin grids
        # differ only for boxes in the lower half of each FPN level bracket).
        self.sampling_ratio = int(sampling_ratio)
        self._pallas_ratio = self.sampling_ratio if self.sampling_ratio > 0 else 2
        # "" is the reference PointRend convention (projects/PointRend
        # Base-PointRend-RCNN-FPN.yaml POOLER_TYPE: "" — the torch head reads
        # image features directly); this redesign pools for the coarse head
        # and point-samples image features in the refinement, so "" maps to
        # the aligned pooler.
        if not pooler_type:
            pooler_type = "ROIAlignV2"
        assert pooler_type in ("ROIAlign", "ROIAlignV2"), pooler_type
        self.aligned = pooler_type == "ROIAlignV2"
        self.min_level = -int(math.log2(self.scales[0]))
        self.max_level = -int(math.log2(self.scales[-1]))
        assert self.max_level - self.min_level + 1 == len(self.scales)
        self.canonical_box_size = canonical_box_size
        self.canonical_level = canonical_level
        self.impl = impl

    def _use_pallas(self, features) -> bool:
        if self.impl == "xla" or not self.aligned:
            return False
        if self.impl == "pallas":
            return True
        import os

        if os.environ.get("JTSM_DISABLE_PALLAS"):
            return False
        c = features[0].shape[-1]
        square = self.output_size[0] == self.output_size[1]
        on_tpu = jax.default_backend() not in ("cpu",)
        return on_tpu and square and c % 256 == 0 and len(features) > 1

    def __call__(
        self,
        features: List[Array],  # per level (B, Hi, Wi, C)
        boxes: Array,  # (R, 4)
        batch_indices: Array,  # (R,) int32
        rois_per_image: int | None = None,
    ) -> Array:
        """``rois_per_image`` is an explicit caller contract: pass it (R // B)
        ONLY when boxes are image-major, i.e. ``batch_indices ==
        repeat(arange(B), rois_per_image)``. The level-resident Pallas path is
        taken only under this contract; without it the gather-based kernel
        (which honors arbitrary batch_indices) is used."""
        if len(features) == 1:
            from ..ops.roi_align import roi_align_batched

            return roi_align_batched(
                features[0],
                boxes,
                batch_indices,
                self.output_size,
                self.scales[0],
                self.sampling_ratio,
                self.aligned,
            )
        levels = assign_boxes_to_levels(
            boxes,
            self.min_level,
            self.max_level,
            self.canonical_box_size,
            self.canonical_level,
        )
        if self._use_pallas(features) and rois_per_image is not None:
            from ..ops.pallas.roi_align_kernel import roi_align_multilevel_pallas

            assert boxes.shape[0] == features[0].shape[0] * rois_per_image, (
                f"rois_per_image={rois_per_image} inconsistent with "
                f"R={boxes.shape[0]}, B={features[0].shape[0]}"
            )
            return roi_align_multilevel_pallas(
                list(features),
                self.scales,
                boxes,
                batch_indices,
                levels,
                self.output_size[0],
                self._pallas_ratio,
                rois_per_image,
            )
        return roi_align_multilevel(
            tuple(features),
            self.scales,
            boxes,
            batch_indices,
            levels,
            self.output_size,
            self.sampling_ratio,
            self.aligned,
        )

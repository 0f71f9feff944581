"""Bootstrapping data samplers (reference:
projects/DensePose/densepose/data/samplers/{densepose_base.py,
densepose_uniform.py, densepose_confidence_based.py, mask_from_densepose.py,
prediction_to_gt.py}).

These turn model *predictions* into pseudo-ground-truth annotations for the
bootstrapping/evolution pipelines: per part class, sample up to
``count_per_class`` points from the pixels predicted to belong to that
class, either uniformly or preferring low-variance (confident) pixels.
Host-side numpy — this runs in the data pipeline between inference and the
next training epoch, never on TPU.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .converters import ToChartResultConverter, ToMaskConverter

N_PART_LABELS = 24


class DensePoseBaseSampler:
    """Reference samplers/densepose_base.py:15."""

    def __init__(self, count_per_class: int = 8):
        self.count_per_class = count_per_class

    def __call__(self, outputs: Dict[str, np.ndarray], image_index: int = 0):
        """Batched inference dict -> list of per-detection pseudo-annotations
        (dicts with x/y/u/v/i in DensePose's 0-255 box-relative convention)."""
        results = ToChartResultConverter.convert(outputs, image_index)
        annotations = []
        for res in results:
            annotations.append(self._sample(res))
        return annotations

    def _sample(self, result: Dict[str, np.ndarray]) -> Dict[str, List[float]]:
        labels = result["labels"]  # (h, w)
        uv = result["uv"]  # (2, h, w)
        sigma = result.get("sigma_2")
        h, w = labels.shape
        ann = {"dp_x": [], "dp_y": [], "dp_U": [], "dp_V": [], "dp_I": []}
        for part_id in range(1, N_PART_LABELS + 1):
            ys, xs = np.nonzero(labels == part_id)
            k = len(ys)
            count = min(self.count_per_class, k)
            if count <= 0:
                continue
            channels = [uv[0][ys, xs], uv[1][ys, xs]]
            if sigma is not None:
                channels.append(sigma[ys, xs])
            values = np.stack(channels, axis=0)  # (n, k)
            idx = self._produce_index_sample(values, count)
            ann["dp_x"].extend(((xs[idx] + 0.5) / w * 256.0).tolist())
            ann["dp_y"].extend(((ys[idx] + 0.5) / h * 256.0).tolist())
            ann["dp_U"].extend(np.clip(values[0, idx], 0, 1).tolist())
            ann["dp_V"].extend(np.clip(values[1, idx], 0, 1).tolist())
            ann["dp_I"].extend([part_id] * count)
        ann["bbox"] = list(result["box_xywh"])
        return ann

    def _produce_index_sample(self, values: np.ndarray, count: int):
        raise NotImplementedError


class DensePoseUniformSampler(DensePoseBaseSampler):
    """Uniform sampling over class pixels (reference densepose_uniform.py)."""

    def _produce_index_sample(self, values: np.ndarray, count: int):
        k = values.shape[1]
        return random.sample(range(k), count)


class DensePoseConfidenceBasedSampler(DensePoseBaseSampler):
    """Prefer low-variance pixels (reference densepose_confidence_based.py):
    sort by the confidence channel, keep the best `search_count`, sample
    uniformly among them."""

    def __init__(
        self,
        confidence_channel: str = "sigma_2",
        count_per_class: int = 8,
        search_count_multiplier: Optional[float] = None,
        search_proportion: Optional[float] = None,
    ):
        super().__init__(count_per_class)
        assert (search_count_multiplier is None) or (search_proportion is None)
        self.confidence_channel = confidence_channel
        self.search_count_multiplier = search_count_multiplier
        self.search_proportion = search_proportion

    def _produce_index_sample(self, values: np.ndarray, count: int):
        k = values.shape[1]
        if k == count:
            return list(range(k))
        assert values.shape[0] >= 3, (
            "confidence-based sampling needs a confidence channel "
            "(run with UV_CONFIDENCE.ENABLED)"
        )
        order = np.argsort(values[2])  # smallest variance first
        if self.search_count_multiplier is not None:
            search_count = min(int(count * self.search_count_multiplier), k)
        elif self.search_proportion is not None:
            search_count = min(max(int(k * self.search_proportion), count), k)
        else:
            search_count = min(count, k)
        pick = random.sample(range(search_count), count)
        return order[:search_count][pick].tolist()


class MaskFromDensePoseSampler:
    """Instance masks from dp coarse segmentation (reference
    mask_from_densepose.py)."""

    def __call__(self, outputs: Dict[str, np.ndarray], image_index: int, image_hw):
        return ToMaskConverter.convert(outputs, image_index, image_hw)


@dataclass
class SampledData:
    """One bootstrapped training example."""

    image: np.ndarray
    boxes_xyxy: np.ndarray
    annotations: List[Dict[str, Any]]


class PredictionToGroundTruthSampler:
    """Compose field samplers into prediction->pseudo-GT conversion
    (reference prediction_to_gt.py): register a sampler per output field,
    then map model outputs to training dicts."""

    def __init__(self, dataset_name: str = ""):
        self.dataset_name = dataset_name
        self._samplers: Dict[str, Callable] = {}

    def register_sampler(self, prediction_attr: str, sampler: Callable):
        self._samplers[prediction_attr] = sampler

    def __call__(
        self, image: np.ndarray, outputs: Dict[str, np.ndarray], image_index: int = 0
    ) -> SampledData:
        valid = np.asarray(outputs["valid"][image_index])
        boxes = np.asarray(outputs["boxes"][image_index])[valid]
        annotations: List[Dict[str, Any]] = [dict() for _ in range(len(boxes))]
        for attr, sampler in self._samplers.items():
            sampled = sampler(outputs, image_index)
            for ann, s in zip(annotations, sampled):
                if isinstance(s, dict):
                    ann.update(s)
                else:
                    ann[attr] = s
        return SampledData(image=image, boxes_xyxy=boxes, annotations=annotations)

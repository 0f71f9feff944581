"""Distributed-aware index streams (reference:
detectron2/data/samplers/distributed_sampler.py:12 ``TrainingSampler``, :57
``RepeatFactorTrainingSampler``, :173 ``InferenceSampler``).

TPU mapping: rank = jax.process_index(); each host reads its
``rank::world_size`` slice of a shared-seed shuffle (SURVEY.md §2.4).
"""

from __future__ import annotations

import itertools
import math
from typing import Iterator, List, Optional

import numpy as np

from ...utils import comm


class TrainingSampler:
    """Infinite shuffled index stream, sharded by host rank."""

    def __init__(self, size: int, shuffle: bool = True, seed: Optional[int] = None):
        self._size = size
        assert size > 0
        self._shuffle = shuffle
        self._seed = int(seed if seed is not None else comm.shared_random_seed())
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()

    def __iter__(self) -> Iterator[int]:
        start = self._rank
        yield from itertools.islice(
            self._infinite_indices(), start, None, self._world_size
        )

    def _infinite_indices(self):
        rng = np.random.RandomState(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)


class RepeatFactorTrainingSampler(TrainingSampler):
    """LVIS-style class-balanced resampling (reference :57)."""

    def __init__(self, repeat_factors: np.ndarray, *, shuffle: bool = True, seed=None):
        self._int_part = np.floor(repeat_factors)
        self._frac_part = repeat_factors - self._int_part
        self._shuffle = shuffle
        self._seed = int(seed if seed is not None else comm.shared_random_seed())
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()

    @staticmethod
    def repeat_factors_from_category_frequency(
        dataset_dicts: List[dict], repeat_thresh: float
    ) -> np.ndarray:
        category_freq: dict = {}
        for dataset_dict in dataset_dicts:
            cat_ids = {ann["category_id"] for ann in dataset_dict["annotations"]}
            for cat_id in cat_ids:
                category_freq[cat_id] = category_freq.get(cat_id, 0) + 1
        num_images = len(dataset_dicts)
        for k, v in category_freq.items():
            category_freq[k] = v / num_images

        category_rep = {
            cat_id: max(1.0, math.sqrt(repeat_thresh / cat_freq))
            for cat_id, cat_freq in category_freq.items()
        }
        rep_factors = []
        for dataset_dict in dataset_dicts:
            cat_ids = {ann["category_id"] for ann in dataset_dict["annotations"]}
            rep_factor = max({category_rep[cat_id] for cat_id in cat_ids}, default=1.0)
            rep_factors.append(rep_factor)
        return np.asarray(rep_factors, dtype=np.float32)

    def _get_epoch_indices(self, rng: np.random.RandomState) -> np.ndarray:
        rands = rng.rand(len(self._frac_part))
        rep_factors = self._int_part + (rands < self._frac_part)
        indices = []
        for dataset_index, rep_factor in enumerate(rep_factors):
            indices.extend([dataset_index] * int(rep_factor))
        return np.asarray(indices, dtype=np.int64)

    def _infinite_indices(self):
        rng = np.random.RandomState(self._seed)
        while True:
            indices = self._get_epoch_indices(rng)
            if self._shuffle:
                randperm = rng.permutation(len(indices))
                yield from indices[randperm].tolist()
            else:
                yield from indices.tolist()


class InferenceSampler:
    """Exact, disjoint partition across hosts (reference :173)."""

    def __init__(self, size: int):
        self._size = size
        assert size > 0
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()
        shard_size = (self._size - 1) // self._world_size + 1
        begin = shard_size * self._rank
        end = min(shard_size * (self._rank + 1), self._size)
        self._local_indices = range(begin, end)

    def __iter__(self) -> Iterator[int]:
        yield from self._local_indices

    def __len__(self) -> int:
        return len(self._local_indices)

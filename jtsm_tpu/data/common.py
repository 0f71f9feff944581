"""Dataset wrappers (reference: detectron2/data/common.py:16 ``MapDataset``,
:62 ``DatasetFromList``, :152 ``AspectRatioGroupedDataset``)."""

from __future__ import annotations

import logging
import pickle
import random
from typing import Callable, Iterable, Iterator, List

import numpy as np


class MapDataset:
    """Map a function over a dataset; on failure retry a different index
    (reference common.py:16)."""

    def __init__(self, dataset, map_func: Callable):
        self._dataset = dataset
        self._map_func = map_func
        self._rng = random.Random(42)
        self._fallback_candidates = set(range(len(dataset)))

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        retry_count = 0
        cur_idx = int(idx)
        while True:
            data = self._map_func(self._dataset[cur_idx])
            if data is not None:
                self._fallback_candidates.add(cur_idx)
                return data
            retry_count += 1
            self._fallback_candidates.discard(cur_idx)
            cur_idx = self._rng.sample(sorted(self._fallback_candidates), k=1)[0]
            if retry_count >= 3:
                logger = logging.getLogger(__name__)
                logger.warning(
                    f"Failed to apply `_map_func` for idx: {idx}, retry count: {retry_count}"
                )


class DatasetFromList:
    """Serialize the list with pickle to reduce python-object memory
    (reference common.py:62)."""

    def __init__(self, lst: List, copy: bool = True, serialize: bool = True):
        self._copy = copy
        self._serialize = serialize
        if self._serialize:
            def _serialize_one(data):
                buffer = pickle.dumps(data, protocol=-1)
                return np.frombuffer(buffer, dtype=np.uint8)

            serialized = [_serialize_one(x) for x in lst]
            self._addr = np.cumsum(
                np.asarray([len(x) for x in serialized], dtype=np.int64)
            )
            self._lst = np.concatenate(serialized)
        else:
            self._lst = lst

    def __len__(self):
        if self._serialize:
            return len(self._addr)
        return len(self._lst)

    def __getitem__(self, idx):
        if self._serialize:
            start_addr = 0 if idx == 0 else self._addr[idx - 1].item()
            end_addr = self._addr[idx].item()
            return pickle.loads(self._lst[start_addr:end_addr].tobytes())
        import copy as _copy

        if self._copy:
            return _copy.deepcopy(self._lst[idx])
        return self._lst[idx]


class AspectRatioGroupedDataset:
    """Batch consecutive items of the same orientation (w>h vs w<h) so the
    padded bucket is tight (reference common.py:152)."""

    def __init__(self, dataset: Iterable, batch_size: int):
        self.dataset = dataset
        self.batch_size = batch_size
        self._buckets = [[] for _ in range(2)]

    def __iter__(self) -> Iterator[List]:
        for d in self.dataset:
            w, h = d["width"], d["height"]
            bucket_id = 0 if w > h else 1
            bucket = self._buckets[bucket_id]
            bucket.append(d)
            if len(bucket) == self.batch_size:
                yield bucket[:]
                del bucket[:]

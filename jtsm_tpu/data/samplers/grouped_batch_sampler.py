"""GroupedBatchSampler (reference:
detectron2/data/samplers/grouped_batch_sampler.py:7): wraps an index
sampler so that each yielded batch contains only elements of one group
(here: aspect-ratio buckets — w > h vs w <= h), preserving the sampler's
order within each group."""

from __future__ import annotations

from typing import Iterator, List, Sequence


class GroupedBatchSampler:
    def __init__(self, sampler, group_ids: Sequence[int], batch_size: int):
        self.sampler = sampler
        self.group_ids = list(group_ids)
        self.batch_size = batch_size
        groups = sorted(set(self.group_ids))
        self._buffer_per_group: dict = {g: [] for g in groups}

    def __iter__(self) -> Iterator[List[int]]:
        for idx in self.sampler:
            g = self.group_ids[idx]
            buf = self._buffer_per_group[g]
            buf.append(idx)
            if len(buf) == self.batch_size:
                yield list(buf)
                buf.clear()

"""Cross-process communication helpers (reference: detectron2/utils/comm.py).

TPU-native mapping (SURVEY.md §2.4): the reference's NCCL/gloo object
collectives become JAX multi-host utilities. On a single process these all
degrade to no-ops, exactly like the reference at world_size 1.

In-graph collectives (gradient psum, SyncBN pmean) are NOT here — they live
inside the pjit-ed train step as ``jax.lax`` collectives over the mesh.
This module is only for host-side coordination (eval gather, seeds, logs).
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    # one JAX process per host drives all local chips; local rank is 0
    return 0


def get_local_size() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across hosts (reference comm.py: synchronize)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("jtsm_tpu.comm.synchronize")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from every host (reference comm.py:139)."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([buf.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for rank in range(world):
        n = int(sizes[rank, 0]) if sizes.ndim == 2 else int(sizes[rank])
        out.append(pickle.loads(gathered[rank, :n].tobytes()))
    return out


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather to one rank (reference comm.py:177). JAX multihost collectives
    are symmetric, so this is all_gather with non-dst ranks discarding."""
    result = all_gather(data)
    if get_rank() == dst:
        return result
    return []


def shared_random_seed() -> int:
    """A random seed shared by all hosts (reference comm.py:220)."""
    seed = int(np.random.randint(2**31))
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Average scalar dicts across hosts (reference comm.py:234)."""
    world = get_world_size()
    if world == 1:
        return dict(input_dict)
    gathered = all_gather(input_dict)
    keys = gathered[0].keys()
    out = {}
    for k in keys:
        vals = [float(d[k]) for d in gathered]
        s = sum(vals)
        out[k] = s / world if average else s
    return out

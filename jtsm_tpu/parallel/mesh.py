"""Device mesh + sharding helpers (SURVEY.md §2.4 mapping).

The reference's NCCL DDP becomes: a 1-D (or N-D) ``jax.sharding.Mesh``, the
batch sharded over the ``data`` axis, parameters replicated (pure DP — the
right baseline for detection-sized models) with the all-reduce of gradients
inserted by XLA over ICI. FSDP-style parameter sharding can be layered on by
giving parameters a non-replicated PartitionSpec.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CfgNode


def build_mesh(
    cfg: Optional[CfgNode] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Optional[Sequence[str]] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if cfg is not None:
        axis_names = tuple(cfg.TPU.MESH_AXES)
        shape = tuple(cfg.TPU.MESH_SHAPE)
    axis_names = tuple(axis_names or ("data",))
    shape = list(shape or (-1,))
    n = len(devices)
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    shape = [n // known if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every leaf with its leading dim sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def fsdp_leaf_sharding(
    x: Any, mesh: Mesh, axis: str = "data", min_size: int = 1 << 16
) -> NamedSharding:
    """FSDP-style sharding rule for one array: shard the largest
    axis-size-divisible dim of big leaves over ``axis``; small leaves stay
    replicated. XLA then all-gathers params where used and reduce-scatters
    grads — ZeRO-3 semantics without manual collectives."""
    n = mesh.shape[axis]
    shape = getattr(x, "shape", ())
    size = int(np.prod(shape)) if shape else 0
    if n > 1 and size >= min_size:
        for d in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if shape[d] % n == 0:
                spec = [None] * len(shape)
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "data", min_size: int = 1 << 16) -> Any:
    """Pytree of FSDP shardings matching ``tree`` (params or optimizer
    state — the rule is shape-based so it maps 1:1 onto momentum buffers)."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_leaf_sharding(x, mesh, axis, min_size), tree
    )

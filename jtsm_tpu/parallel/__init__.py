from .mesh import (
    batch_sharding,
    build_mesh,
    fsdp_leaf_sharding,
    fsdp_shardings,
    replicated,
    shard_batch_pytree,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "fsdp_leaf_sharding",
    "fsdp_shardings",
    "replicated",
    "shard_batch_pytree",
]

"""OOM-retry helper (reference: detectron2/utils/memory.py:26
``retry_if_cuda_oom``).

TPU note: XLA allocates statically at compile time, so runtime OOM retries
are rarer; the useful fallback is re-running the (host-side) operation on
CPU, which this wrapper does."""

from __future__ import annotations

import functools
import logging
from contextlib import contextmanager

import jax

logger = logging.getLogger(__name__)


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s or "exceed" in s.lower()


def retry_if_tpu_oom(func):
    """Run func; on device OOM retry once on CPU."""

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception as e:  # jax runtime errors
            if not _is_oom(e):
                raise
            logger.warning(
                f"Attempting to copy inputs of {func} to CPU due to device OOM"
            )
            cpu = jax.devices("cpu")[0]
            new_args = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, cpu) if isinstance(x, jax.Array) else x, args
            )
            new_kwargs = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, cpu) if isinstance(x, jax.Array) else x, kwargs
            )
            with jax.default_device(cpu):
                return func(*new_args, **new_kwargs)

    return wrapped


retry_if_cuda_oom = retry_if_tpu_oom  # API-compat alias

"""Multi-host launch (reference: detectron2/engine/launch.py:24).

TPU re-design: the reference spawns one process per GPU and initializes
NCCL; on TPU there is ONE process per host driving all local chips, and
``jax.distributed.initialize`` wires hosts together (SURVEY.md §2.4). The
``launch`` signature is kept for tool compatibility.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Optional, Tuple

import jax

logger = logging.getLogger(__name__)


def launch(
    main_func: Callable,
    num_gpus_per_machine: int = 0,  # compat; chips are discovered by JAX
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args: Tuple[Any, ...] = (),
) -> None:
    if num_machines > 1:
        coordinator = None
        if dist_url and dist_url not in ("auto",):
            coordinator = dist_url.replace("tcp://", "")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()} / {jax.process_count()}"
        )
    main_func(*args)

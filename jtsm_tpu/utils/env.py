"""Environment / seeding helpers (reference: detectron2/utils/env.py:21)."""

from __future__ import annotations

import datetime
import logging
import os
import random

import numpy as np


def seed_all_rng(seed: int | None = None) -> int:
    """Seed python/numpy RNGs; return the seed so callers can derive a
    ``jax.random.key`` from it (JAX RNG is explicit, not global)."""
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
        logger = logging.getLogger(__name__)
        logger.info(f"Using a generated random seed {seed}")
    seed = int(seed) % (2**31)
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def collect_env_info() -> str:
    import sys

    import jax

    lines = [
        f"sys.platform: {sys.platform}",
        f"Python: {sys.version.replace(chr(10), ' ')}",
        f"JAX: {jax.__version__}",
        f"jax.devices: {jax.devices()}",
        f"process_count: {jax.process_count()}",
    ]
    try:
        import flax

        lines.append(f"flax: {flax.__version__}")
    except ImportError:
        pass
    return "\n".join(lines)


_ENV_SETUP_DONE = False


def setup_environment() -> None:
    """Perform environment setup work, honoring a user-supplied hook module
    (reference detectron2/utils/env.py:40 ``setup_environment`` +
    ``setup_custom_environment``): if ``$JTSM_ENV_MODULE`` names an importable
    module or a .py file path, import it and call its ``setup_environment()``."""
    global _ENV_SETUP_DONE
    if _ENV_SETUP_DONE:
        return
    _ENV_SETUP_DONE = True
    custom = os.environ.get("JTSM_ENV_MODULE")
    if not custom:
        return
    if custom.endswith(".py"):
        import importlib.util

        spec = importlib.util.spec_from_file_location("jtsm_tpu.utils._custom_env", custom)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
    else:
        import importlib

        module = importlib.import_module(custom)
    assert hasattr(module, "setup_environment") and callable(module.setup_environment), (
        f"Custom environment module {custom} must define setup_environment()"
    )
    module.setup_environment()

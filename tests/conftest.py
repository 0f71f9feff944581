"""Test configuration: force an 8-device virtual CPU platform so sharding
and mesh code paths are exercised without TPU hardware.

Note: the environment's sitecustomize force-registers the `axon` TPU backend
and sets jax_platforms="axon,cpu"; we must override via jax.config (env vars
alone are ignored) BEFORE any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test configuration: force an 8-device CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4 item 5: JAX's standard multi-host test
story)."""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (the TPU tunnel), which
# is single-client — concurrent test processes would deadlock on it.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

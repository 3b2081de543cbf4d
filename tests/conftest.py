"""Test configuration: force an 8-device CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4 item 5: JAX's standard multi-host test
story).  ``SMCSMC_TPU_TESTS=1`` (the ``make tpu-smoke`` tier) keeps the
session's real TPU backend instead — only the tests in test_tpu_smoke.py
run there; everything else self-deselects via the conftest marker hook."""

import os

if os.environ.get("SMCSMC_TPU_TESTS"):
    from smcsmc_tpu._cache import enable_compilation_cache

    enable_compilation_cache()
else:
    # Force CPU: the session env pins JAX_PLATFORMS=axon (the TPU tunnel),
    # which is single-client — concurrent test processes would deadlock.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)


def pytest_collection_modifyitems(config, items):
    """In the TPU tier, run ONLY tpu-marked tests (one job, serial — the
    tunnel is single-client); in the CPU tiers, skip them."""
    import pytest

    tpu_mode = bool(os.environ.get("SMCSMC_TPU_TESTS"))
    for item in items:
        is_tpu = "tpu" in item.keywords
        if tpu_mode and not is_tpu:
            item.add_marker(pytest.mark.skip(reason="TPU tier runs only tpu tests"))
        elif not tpu_mode and is_tpu:
            item.add_marker(
                pytest.mark.skip(reason="needs SMCSMC_TPU_TESTS=1 (make tpu-smoke)")
            )

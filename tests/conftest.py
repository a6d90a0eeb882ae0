"""Test harness: force the CPU backend with 8 virtual devices so mesh /
sharding code paths run without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize imports jax and pins
JAX_PLATFORMS=axon (the TPU tunnel) at interpreter startup, so the usual
`JAX_PLATFORMS=cpu` env var is too late — but backends initialize lazily,
so jax.config.update('jax_platforms', 'cpu') plus XLA_FLAGS before first
device use still works. Running tests on CPU also avoids contending with a
benchmark process for the single TPU chip.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The suite compiles hundreds of distinct programs across modules;
    on the 8-virtual-device CPU backend the live-executable memory adds
    up and has produced allocation aborts late in the run. Dropping
    compiled programs between modules bounds the peak."""
    yield
    import jax

    jax.clear_caches()

"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (SURVEY.md §4c), and with x64 enabled so the float64
parity path (reference plugin precision, foo_dsp_bfir/common.h:17) is testable.

Platform forcing uses jax.config.update (not the JAX_PLATFORMS env var): this
image's sitecustomize registers the axon TPU plugin at interpreter start and
pins JAX_PLATFORMS, so the env var is already consumed by the time conftest
runs. XLA_FLAGS is still honored lazily at first CPU-backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    # registered explicitly so plain pytest (no xdist) doesn't warn; under
    # pytest-xdist run with --dist loadgroup so the heavy sharded-session
    # tests share one worker (concurrent 8-device shard_map compiles have
    # aborted workers under 4-way contention — VERDICT r4 weak #5)
    config.addinivalue_line(
        "markers",
        "xdist_group(name): serialize marked tests onto one xdist worker")

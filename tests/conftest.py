"""Test configuration: force CPU with 8 virtual devices.

Tests run on an 8-device virtual CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the reference has no multi-device tests at
all, SURVEY.md §4).

Note: the axon TPU plugin's registration hook calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start,
overriding the env var — so we must both set XLA_FLAGS before jax loads
AND push the config back to cpu after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

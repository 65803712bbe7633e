"""Test configuration: force CPU with 8 virtual devices.

Tests run on an 8-device virtual CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the reference has no multi-device tests at
all, SURVEY.md §4).

Note: the axon TPU plugin's lazy initialization re-runs
``jax.config.update("jax_platforms", "axon,cpu")`` when the backend first
comes up, so a config.update("cpu") from conftest import time does NOT
survive — the suite silently lands on the TPU (caught via a Swin parity
test failing with bf16-sized errors: TPU fp32 matmuls default to bf16
passes).  Setting the JAX_PLATFORMS *env var* before jax loads is the
binding choice (diffusionvid_tpu/__init__.py re-asserts it after import);
the config.update below is a belt-and-braces backstop.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

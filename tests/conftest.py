"""Test configuration: force an 8-device virtual CPU platform.

Real TPU hardware in CI is a single chip; sharding tests need N devices, so
every test runs on the CPU backend with 8 virtual devices
(SURVEY.md §4 "Distributed" test strategy).

The platform override must go through ``jax.config`` (not just the env):
TPU environments may pre-register their backend at interpreter start via
sitecustomize and pin ``jax_platforms`` programmatically.
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
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

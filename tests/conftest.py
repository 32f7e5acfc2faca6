"""Test configuration: force an 8-device virtual CPU platform.

Real TPU hardware in CI is a single chip; sharding tests need N devices, so
every test runs on the CPU backend with 8 virtual devices
(SURVEY.md §4 "Distributed" test strategy).

The platform override must go through ``jax.config`` (not just the env):
TPU environments may pre-register their backend at interpreter start via
sitecustomize and pin ``jax_platforms`` programmatically.
"""

import os

# NON_TPU_TEST_PLATFORM=tpu runs the suite against the real chip instead:
# tiny-tile kernel tests auto-skip (their blocks cannot lower on hardware)
# and tests/test_tpu_parity.py becomes the compiled-Mosaic numerics gate.
# Default is the 8-device virtual CPU mesh.
_PLATFORM = os.environ.get("NON_TPU_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

if _PLATFORM == "cpu":
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
else:
    # Compile cache: first TPU compiles through the tunnel take minutes.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

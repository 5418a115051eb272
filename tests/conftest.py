"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4d) so
sharding/pjit paths are exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize in /root/.axon_site) force-registers
# itself and overrides JAX_PLATFORMS at interpreter boot; re-forcing via
# config before any backend initializes wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

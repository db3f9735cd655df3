"""Test configuration: force an 8-device virtual CPU platform.

Mirrors the SURVEY §4 TPU test strategy: multi-device sharding paths run in CI
on a host-CPU mesh via ``--xla_force_host_platform_device_count``, no TPU
required. This must run before any JAX backend is initialized; the axon TPU
plugin registers itself via sitecustomize, so we override the platform through
jax.config (env vars alone are not enough).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

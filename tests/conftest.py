"""Test configuration: CPU backend with 8 virtual devices + float64.

Correctness tests run on CPU in f64 (matching the reference's double
precision), with a virtual 8-device mesh for sharding tests — the standard
way to validate pjit/shard_map code without a pod (SURVEY.md §4).

Note: this environment pre-imports jax via sitecustomize with a TPU backend
pinned through JAX_PLATFORMS, so the platform must be overridden through
jax.config (env vars are read before conftest runs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

"""Test harness: run on CPU with 8 virtual devices so sharding tests work anywhere.

This is the standard JAX trick for testing Mesh/shard_map logic without a pod
(SURVEY.md section 4). Two sandbox quirks shape this file:

- sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at interpreter start with
  JAX_PLATFORMS=axon pinned, so env mutation here is too late — only
  jax.config.update("jax_platforms") applies before the first backend query;
- every XLA program compiles through a remote service (~0.4s+ each), so tests jit
  whole computations and share a persistent on-disk compilation cache.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

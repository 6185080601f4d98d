"""Test harness: run on CPU with 8 virtual devices so sharding tests work anywhere.

This is the standard JAX trick for testing Mesh/shard_map logic without a pod
(SURVEY.md section 4): the real TPU chip (if present) is deliberately not used by the
test suite — tests must be deterministic and runnable in CI.
"""

import os

# force CPU: the sandbox pins JAX_PLATFORMS=axon globally, so setdefault is not enough
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compile cache: this sandbox compiles through a remote service, so every
# XLA program costs ~0.4s+ to build; cache them on disk. NOTE: the env-var spelling
# (JAX_COMPILATION_CACHE_DIR) is not honored by this jax build — use config.update.
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

"""Test harness: run on CPU with 8 virtual devices so sharding tests work anywhere.

This is the standard JAX trick for testing Mesh/shard_map logic without a pod
(SURVEY.md section 4): the real TPU chip (if present) is deliberately not used by the
test suite — tests must be deterministic and runnable in CI.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

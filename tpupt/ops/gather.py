"""Row gathers tuned for TPU.

Per-lane dynamic gathers lower poorly on TPU (no native vector-gather). For the small
interned tables this framework produces (materials, textures, per-scene quad/sphere
attributes), a one-hot matmul is far faster: build [B, N] one-hot on the VPU, contract
with the [N, C] table on the MXU. Large tables (triangle meshes, the image atlas) fall
back to XLA's gather.
"""

from __future__ import annotations

import jax.numpy as jnp

ONE_HOT_MAX = 128  # tables up to this many rows go through the MXU


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [N, C], idx [B] int -> [B, C]."""
    n = table.shape[0]
    if n <= ONE_HOT_MAX:
        onehot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(table.dtype)
        return onehot @ table
    return jnp.take(table, idx, axis=0)

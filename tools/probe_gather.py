"""Microbench TPU gather formulations for the env-texture lookup.

The lights-scene decomposition (tools/probe_lights.py, round 5) showed the
per-miss env gather is ~59% of the whole render (constant-color env: 51.0M
rays/s; u8 map: 21.0M). This probe times candidate gather shapes ON CHIP with
the op repeated inside one jitted fori_loop (the naive per-call timing is
swamped by ~20-30 ms of tunnel dispatch latency), data-dependent across trips
so XLA cannot hoist it.

Candidates:
  rows3   jnp.take(tbl [N,3], idx, axis=0)        — what sample_environment does
  flat3   three jnp.take(tbl_c [N], idx)          — per-channel flat gathers
  packed  one jnp.take(tbl_u32 [N], idx) + unpack — RGB packed 8/8/8 in a u32
  small   rows3 from a 4k-texel table             — table-size sensitivity

Run: timeout 1800 python tools/probe_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("PROBE_LANES", 1 << 20))
N = int(os.environ.get("PROBE_TEXELS", 512 * 1024))
TRIPS = 32
REPS = 5

rng = np.random.default_rng(0)
tbl = jnp.asarray(rng.random((N, 3), dtype=np.float32))
tbl_r, tbl_g, tbl_b = tbl[:, 0], tbl[:, 1], tbl[:, 2]
u8 = (np.asarray(tbl) * 255).astype(np.uint32)
tbl_packed = jnp.asarray((u8[:, 0] << 16) | (u8[:, 1] << 8) | u8[:, 2])
idx0 = jnp.asarray(rng.integers(0, N, size=B, dtype=np.int32))

small = jnp.asarray(rng.random((4096, 3), dtype=np.float32))


def bench(tag, fn):
    f = jax.jit(fn)
    jax.block_until_ready(f(idx0))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(idx0))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    per = med / TRIPS / B * 1e9
    print(f"{tag:10s} {med*1e3:8.1f} ms/{TRIPS} trips  {per:7.3f} ns/lane-gather", flush=True)


def loop(gather_one):
    """fori_loop: acc feeds the next trip's indices -> no hoisting."""

    def run(idx):
        def body(i, carry):
            acc, idx = carry
            g = gather_one(idx)
            acc = acc + g
            idx = (idx + g.astype(jnp.int32) + i) & (N - 1)
            return acc, idx

        acc, _ = lax.fori_loop(0, TRIPS, body, (jnp.zeros((B,), jnp.float32), idx))
        return acc

    return run


bench("rows3", loop(lambda idx: jnp.sum(jnp.take(tbl, idx, axis=0), axis=-1)))
bench("flat3", loop(
    lambda idx: jnp.take(tbl_r, idx) + jnp.take(tbl_g, idx) + jnp.take(tbl_b, idx)
))


def packed_gather(idx):
    p = jnp.take(tbl_packed, idx)
    r = (p >> 16).astype(jnp.float32)
    g = ((p >> 8) & 0xFF).astype(jnp.float32)
    b = (p & 0xFF).astype(jnp.float32)
    return (r + g + b) * (1.0 / 255.0)


bench("packed", loop(packed_gather))
bench("small", loop(lambda idx: jnp.sum(jnp.take(small, idx & 4095, axis=0), axis=-1)))

# round-5 follow-ups: narrow row gathers (the env pdf / alias+prob tables)
tbl1 = tbl[:, :1]
tbl2 = tbl[:, :2]
bench("rows1", loop(lambda idx: jnp.take(tbl1, idx, axis=0)[:, 0]))
bench("rows2", loop(lambda idx: jnp.sum(jnp.take(tbl2, idx, axis=0), axis=-1)))
bench("flat1", loop(lambda idx: jnp.take(tbl_r, idx)))

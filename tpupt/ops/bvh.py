"""BVH over the triangle table: Morton-ordered build + stackless device traversal.

TPU re-design of the reference's acceleration structures (SURVEY.md section 3.2):
the reference builds a full-sweep SAH tree per HittableList plus a *private* BVH per
TriangleMesh (bvh.rs:24-120, mesh.rs:195) and traverses recursively with a call
stack (bvh.rs:124-163). None of that maps to XLA: recursion and pointer graphs are
out; what works is a flat node array and a bounded, branch-free iteration.

Design:
- build (host, numpy): triangles sorted by the Morton code of their centroid
  (the LBVH ordering of Lauterbach/Karras), then a balanced binary tree over the
  sorted range is emitted in DFS *pre-order* with an escape ("skip") index per node.
  Leaves hold up to LEAF_SIZE contiguous triangles of the sorted order.
- traversal (device, jit): each lane carries a node cursor i. In pre-order layout,
  `i+1` is the first child (enter subtree) and `skip[i]` is the next node with the
  whole subtree bypassed; for a leaf, `i+1 == skip[i]`, so the update rule is one
  select: i <- hit & internal ? i+1 : skip[i]. A hit leaf intersects its LEAF_SIZE
  triangle rows (contiguous -> gather of start+k) before advancing. The loop is a
  `lax.while_loop` that ends when every lane's cursor runs off the node array —
  bounded, shape-static, no stack. AABB tests cull against the lane's current best
  t, so the traversal tightens as hits are found.

The spheres/quads tables of every reference scene are tiny and stay on the blocked
brute-force sweep (ops/intersect.py); the BVH engages for the triangle table above
a static size threshold (scene/compile.py reorders the table and emits node arrays).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax
from ..core.dtypes import NP_REAL

LEAF_SIZE = 4  # matches the reference's leaf bound (bvh.rs:22)


# ---------------------------------------------------------------------------
# host-side build
# ---------------------------------------------------------------------------


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10 bits per axis -> 30-bit Morton codes. x: [N,3] in [0,1)."""
    q = np.clip((x * 1024.0).astype(np.uint64), 0, 1023)

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (spread(q[:, 0]) << np.uint64(2)) | (spread(q[:, 1]) << np.uint64(1)) | spread(q[:, 2])


def build_tri_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, native: bool = True):
    """Build the tree over [N] triangles -> (order [N], nodes dict of arrays).

    Returns the Morton sort order (apply it to every per-triangle table) and the
    node arrays: bmin/bmax [M,3] f32, skip [M] i32, start [M] i32, count [M] i32
    (count==0 marks internal nodes). Node 0 is the root.

    Prefers the native C++ builder (tpupt/native — the counterpart of the
    reference's compiled bvh.rs build); this numpy implementation is the portable
    fallback and the parity oracle for tests (identical output by construction).
    """
    if native:
        from .. import native as _native

        out = _native.build_tri_bvh(np.asarray(v0), np.asarray(e1), np.asarray(e2))
        if out is not None:
            return out
    n = v0.shape[0]
    v1 = v0 + e1
    v2 = v0 + e2
    pad = 1e-3  # the reference pads every AABB by 1e-3 (aabb.rs:16-21)
    lo = np.minimum(np.minimum(v0, v1), v2) - pad
    hi = np.maximum(np.maximum(v0, v1), v2) + pad
    cen = 0.5 * (lo + hi)
    span = np.maximum(cen.max(0) - cen.min(0), 1e-12)
    order = np.argsort(_morton3((cen - cen.min(0)) / span), kind="stable").astype(np.int32)

    lo = lo[order]
    hi = hi[order]

    bmin, bmax, start, count = [], [], [], []

    # pre-order emission with an explicit stack (meshes reach 10^4+ triangles);
    # skip indices are patched afterwards by mirroring the same splits.
    work = [(0, n)]
    while work:
        a, b = work.pop()
        bmin.append(lo[a:b].min(0))
        bmax.append(hi[a:b].max(0))
        if b - a <= LEAF_SIZE:
            start.append(a)
            count.append(b - a)
        else:
            start.append(0)
            count.append(0)
            mid = (a + b) // 2
            work.append((mid, b))  # right below left -> left pops first (pre-order)
            work.append((a, mid))

    skip_arr = np.zeros(len(bmin), dtype=np.int32)
    # skip[i] = first node index after i's subtree: walk the same splits again,
    # computing each range's subtree node count (memoized by range size)
    sizes = {}

    def subtree_nodes(t: int) -> int:
        if t <= LEAF_SIZE:
            return 1
        if t in sizes:
            return sizes[t]
        m = t // 2
        r = 1 + subtree_nodes(m) + subtree_nodes(t - m)
        sizes[t] = r
        return r

    stack = [(0, n)]
    cursor = 0
    while stack:
        a, b = stack.pop()
        t = b - a
        skip_arr[cursor] = cursor + subtree_nodes(t)
        cursor += 1
        if t > LEAF_SIZE:
            mid = (a + b) // 2
            stack.append((mid, b))
            stack.append((a, mid))

    nodes = dict(
        bmin=np.asarray(bmin, dtype=NP_REAL),
        bmax=np.asarray(bmax, dtype=NP_REAL),
        skip=skip_arr,
        start=np.asarray(start, dtype=np.int32),
        count=np.asarray(count, dtype=np.int32),
    )
    return order, nodes


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------


def bvh_closest_tri(sd, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """Closest triangle hit via stackless traversal -> (t [B], idx [B]).

    idx indexes the (Morton-reordered) triangle tables; misses carry t = BIG.
    """
    from ..core.linalg import BIG

    n_nodes = sd.bvh_skip.shape[0]
    b = ox.shape[0]

    inv_dx = 1.0 / jnp.where(jnp.abs(dx) < 1e-20, jnp.where(dx < 0, -1e-20, 1e-20), dx)
    inv_dy = 1.0 / jnp.where(jnp.abs(dy) < 1e-20, jnp.where(dy < 0, -1e-20, 1e-20), dy)
    inv_dz = 1.0 / jnp.where(jnp.abs(dz) < 1e-20, jnp.where(dz < 0, -1e-20, 1e-20), dz)

    # node table fused as [M, 8]: min(3), max(3), skip, leaf_meta
    # (kept as separate arrays in SceneData; fuse gathers by index instead)
    def body(state):
        i, best_t, best_i = state
        ii = jnp.minimum(i, n_nodes - 1)
        bmin = jnp.take(sd.bvh_min, ii, axis=0)
        bmax = jnp.take(sd.bvh_max, ii, axis=0)
        skip = jnp.take(sd.bvh_skip, ii, axis=0)
        start = jnp.take(sd.bvh_start, ii, axis=0)
        count = jnp.take(sd.bvh_count, ii, axis=0)

        # slab test against the lane's current best t (aabb.rs:31-42 + padding
        # baked into bmin/bmax at build: reference pads by 1e-3, aabb.rs:16-21)
        t1x = (bmin[..., 0] - ox) * inv_dx
        t2x = (bmax[..., 0] - ox) * inv_dx
        t1y = (bmin[..., 1] - oy) * inv_dy
        t2y = (bmax[..., 1] - oy) * inv_dy
        t1z = (bmin[..., 2] - oz) * inv_dz
        t2z = (bmax[..., 2] - oz) * inv_dz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.maximum(jnp.minimum(t1z, t2z), tmin),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.minimum(jnp.maximum(t1z, t2z), jnp.minimum(best_t, tmax)),
        )
        active = i < n_nodes
        hit_box = active & (tn <= tf)

        is_leaf = count > 0
        do_leaf = hit_box & is_leaf

        # leaf: intersect LEAF_SIZE contiguous triangle rows (Moller-Trumbore,
        # mesh.rs:50-82); lanes not at a hit leaf mask the result
        for k in range(LEAF_SIZE):
            ti = jnp.minimum(start + k, sd.tri_v0.shape[0] - 1)
            lane_on = do_leaf & (k < count)
            v0 = jnp.take(sd.tri_v0, ti, axis=0)
            te1 = jnp.take(sd.tri_e1, ti, axis=0)
            te2 = jnp.take(sd.tri_e2, ti, axis=0)
            hx = dy * te2[..., 2] - dz * te2[..., 1]
            hy = dz * te2[..., 0] - dx * te2[..., 2]
            hz = dx * te2[..., 1] - dy * te2[..., 0]
            a = te1[..., 0] * hx + te1[..., 1] * hy + te1[..., 2] * hz
            f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
            sx = ox - v0[..., 0]
            sy = oy - v0[..., 1]
            sz = oz - v0[..., 2]
            u = f * (sx * hx + sy * hy + sz * hz)
            qx = sy * te1[..., 2] - sz * te1[..., 1]
            qy = sz * te1[..., 0] - sx * te1[..., 2]
            qz = sx * te1[..., 1] - sy * te1[..., 0]
            v = f * (dx * qx + dy * qy + dz * qz)
            t = f * (te2[..., 0] * qx + te2[..., 1] * qy + te2[..., 2] * qz)
            ok = (
                lane_on
                & (jnp.abs(a) >= 1e-8)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > tmin)
                & (t < tmax)
                & (t < best_t)
            )
            best_i = jnp.where(ok, ti.astype(jnp.int32), best_i)
            best_t = jnp.where(ok, t, best_t)

        i_next = jnp.where(hit_box & ~is_leaf, i + 1, skip)
        i_next = jnp.where(active, i_next, i)
        return i_next, best_t, best_i

    def cond(state):
        return jnp.any(state[0] < n_nodes)

    i0 = jnp.zeros((b,), jnp.int32)
    t0 = jnp.full((b,), BIG)
    idx0 = jnp.zeros((b,), jnp.int32)
    _, best_t, best_i = lax.while_loop(cond, body, (i0, t0, idx0))
    return best_t, best_i

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
CLUSTER_MAX = 64  # triangles per Pallas cluster block (ops/pallas_tri.py)
SAH_BINS = 16  # binned-SAH bin count (vs the reference's full-sweep SAH, bvh.rs:54-120)
AABB_PAD = 1e-3  # the reference pads every AABB by 1e-3 (aabb.rs:16-21)


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
# binned-SAH build (+ cluster cut for the Pallas packet kernel)
# ---------------------------------------------------------------------------


def _half_area(lo: np.ndarray, hi: np.ndarray) -> float:
    d = np.maximum(hi - lo, 0.0)
    return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


def build_tri_bvh_sah(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, native: bool = True):
    """Binned-SAH build -> (order [N], nodes dict, clusters dict).

    Replaces the Morton/median build with a surface-area-guided tree, the
    re-design of the reference's full-sweep SAH (bvh.rs:54-120: per axis it sorts
    centroids and evaluates *every* split plane, O(n^2) per level; here the
    standard 16-bin approximation gives the same tree quality at O(n) per level).

    Returns:
    - order [N]: DFS leaf order (old index per new slot) — apply to every
      per-triangle table;
    - nodes: the stackless escape-index arrays consumed by bvh_closest_tri
      (bmin/bmax [M,3], skip/start/count [M]), same format as build_tri_bvh;
    - clusters: the tree cut at subtrees of <= CLUSTER_MAX triangles —
      start [C], count [C], bmin [C,3], bmax [C,3]; ranges are contiguous,
      sorted, and cover [0, N). The Pallas TPU kernel (ops/pallas_tri.py) culls
      whole clusters against ray packets and brute-forces inside, so cluster
      AABB tightness (SAH, not Morton) is what buys its speed.
    """
    if native:
        from .. import native as _native

        out = _native.build_tri_bvh_sah(np.asarray(v0), np.asarray(e1), np.asarray(e2))
        if out is not None:
            return out
    n = v0.shape[0]
    v1 = v0 + e1
    v2 = v0 + e2
    lo = (np.minimum(np.minimum(v0, v1), v2) - AABB_PAD).astype(np.float64)
    hi = (np.maximum(np.maximum(v0, v1), v2) + AABB_PAD).astype(np.float64)
    cen = 0.5 * (lo + hi)
    idx = np.arange(n, dtype=np.int64)

    bmin, bmax, start, count, skip = [], [], [], [], []
    cl_start, cl_count, cl_min, cl_max = [], [], [], []

    def _split(a: int, b: int):
        """Partition idx[a:b] in place; returns the split point (or None -> leaf)."""
        seg = idx[a:b]
        c = cen[seg]
        cmin = c.min(0)
        cmax = c.max(0)
        slo = lo[seg]
        shi = hi[seg]
        best_cost = np.inf
        best = None  # (axis, mask)
        for axis in range(3):
            ext = cmax[axis] - cmin[axis]
            if ext < 1e-12:
                continue
            bins = np.minimum(
                ((c[:, axis] - cmin[axis]) * (SAH_BINS / ext)).astype(np.int64), SAH_BINS - 1
            )
            counts = np.bincount(bins, minlength=SAH_BINS)
            blo = np.full((SAH_BINS, 3), np.inf)
            bhi = np.full((SAH_BINS, 3), -np.inf)
            np.minimum.at(blo, bins, slo)
            np.maximum.at(bhi, bins, shi)
            # prefix (left of split) and suffix (right) unions + counts
            plo = np.minimum.accumulate(blo, axis=0)
            phi = np.maximum.accumulate(bhi, axis=0)
            qlo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
            qhi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
            pc = np.cumsum(counts)
            n_seg = b - a
            for s in range(SAH_BINS - 1):  # split after bin s
                nl = pc[s]
                nr = n_seg - nl
                if nl == 0 or nr == 0:
                    continue
                cost = _half_area(plo[s], phi[s]) * nl + _half_area(qlo[s + 1], qhi[s + 1]) * nr
                if cost < best_cost:
                    best_cost = cost
                    best = (axis, s, bins)
        if best is not None:
            axis, s, bins = best
            mask = bins <= s
        else:
            # degenerate (all centroids equal): median split on the largest axis
            axis = int(np.argmax(cmax - cmin)) if (cmax - cmin).max() > 0 else 0
            order_ax = np.argsort(c[:, axis], kind="stable")
            mask = np.zeros(b - a, dtype=bool)
            mask[order_ax[: (b - a) // 2]] = True
        left = seg[mask]
        right = seg[~mask]
        idx[a : a + len(left)] = left
        idx[a + len(left) : b] = right
        return a + len(left)

    # explicit-stack DFS pre-order emission; skip patched when a subtree closes
    work = [("node", 0, n, False)]
    while work:
        tag, a, b, in_cluster = work.pop()
        if tag == "close":
            skip[a] = len(count)  # a = node id here
            continue
        node_id = len(count)
        seg = idx[a:b]
        bmin.append(lo[seg].min(0))
        bmax.append(hi[seg].max(0))
        skip.append(0)
        work.append(("close", node_id, 0, False))
        if not in_cluster and (b - a) <= CLUSTER_MAX:
            cl_start.append(a)
            cl_count.append(b - a)
            cl_min.append(bmin[-1])
            cl_max.append(bmax[-1])
            in_cluster = True
        if b - a <= LEAF_SIZE:
            start.append(a)
            count.append(b - a)
        else:
            start.append(0)
            count.append(0)
            mid = _split(a, b)
            work.append(("node", mid, b, in_cluster))  # right below left
            work.append(("node", a, mid, in_cluster))

    nodes = dict(
        bmin=np.asarray(bmin, dtype=NP_REAL),
        bmax=np.asarray(bmax, dtype=NP_REAL),
        skip=np.asarray(skip, dtype=np.int32),
        start=np.asarray(start, dtype=np.int32),
        count=np.asarray(count, dtype=np.int32),
    )
    clusters = _merge_clusters(
        np.asarray(cl_start, dtype=np.int64),
        np.asarray(cl_count, dtype=np.int64),
        np.asarray(cl_min, dtype=np.float64),
        np.asarray(cl_max, dtype=np.float64),
    )
    return idx.astype(np.int32), nodes, clusters


def _merge_clusters(cl_start, cl_count, cl_min, cl_max):
    """Greedily merge adjacent clusters while the union stays <= CLUSTER_MAX.

    SAH cuts can leave small subtrees; merging adjacent (DFS-contiguous, hence
    spatially related) ranges cuts the pad waste of the fixed-64 packed blocks.
    """
    ms, mc, mlo, mhi = [], [], [], []
    for s, c, lo_, hi_ in zip(cl_start, cl_count, cl_min, cl_max):
        if ms and mc[-1] + c <= CLUSTER_MAX:
            mc[-1] += c
            mlo[-1] = np.minimum(mlo[-1], lo_)
            mhi[-1] = np.maximum(mhi[-1], hi_)
        else:
            ms.append(int(s))
            mc.append(int(c))
            mlo.append(lo_)
            mhi.append(hi_)
    return dict(
        start=np.asarray(ms, dtype=np.int32),
        count=np.asarray(mc, dtype=np.int32),
        bmin=np.asarray(mlo, dtype=NP_REAL),
        bmax=np.asarray(mhi, dtype=NP_REAL),
    )


def count_node_visits(nodes, v0, e1, e2, o, d, tmin=1e-3, tmax=3e38):
    """Host-side traversal instrumentation -> (visits/ray, leaf tri tests/ray).

    Used to compare build quality (Morton/median vs binned SAH) for BASELINE.md;
    runs the same stackless walk as bvh_closest_tri, in numpy, per ray.
    """
    visits = 0
    tri_tests = 0
    n_nodes = nodes["skip"].shape[0]
    for r in range(o.shape[0]):
        oo, dd = o[r], d[r]
        inv = 1.0 / np.where(np.abs(dd) < 1e-20, np.where(dd < 0, -1e-20, 1e-20), dd)
        best = tmax
        i = 0
        while i < n_nodes:
            visits += 1
            t1 = (nodes["bmin"][i] - oo) * inv
            t2 = (nodes["bmax"][i] - oo) * inv
            tn = max(np.minimum(t1, t2).max(), tmin)
            tf = min(np.maximum(t1, t2).min(), best)
            hit = tn <= tf
            if hit and nodes["count"][i] > 0:
                s, c = nodes["start"][i], nodes["count"][i]
                for k in range(s, s + c):
                    tri_tests += 1
                    h = np.cross(dd, e2[k])
                    a = float(e1[k] @ h)
                    if abs(a) < 1e-8:
                        continue
                    f = 1.0 / a
                    sv = oo - v0[k]
                    u = f * (sv @ h)
                    q = np.cross(sv, e1[k])
                    v = f * (dd @ q)
                    t = f * (e2[k] @ q)
                    if 0 <= u <= 1 and v >= 0 and u + v <= 1 and tmin < t < best:
                        best = t
            i = i + 1 if (hit and nodes["count"][i] == 0) else int(nodes["skip"][i])
    b = o.shape[0]
    return visits / b, tri_tests / b


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

"""Pallas TPU kernel: SAH-cluster packet traversal for the triangle table.

This is the TPU-native replacement for the reference's per-ray recursive BVH
walk over mesh triangles (bvh.rs:124-163 + the nested per-mesh trees,
mesh.rs:195). Per-lane pointer chasing is the one thing a TPU cannot do — the
round-1 stackless traversal measured 28x SLOWER than brute force on TPU because
every node step is a 128-lane divergent gather. This kernel keeps the hierarchy
but moves the divergence to *packet* granularity, where the VPU is happy:

- the SAH tree (ops/bvh.py build_tri_bvh_sah) is cut into clusters of up to 64
  triangles, contiguous in the reordered table, each with a tight AABB;
- triangles are packed into (8, 128) f32 VMEM blocks — 8 sublane rows x 8 tri
  slots x 16 lanes of fields — so a whole cluster is ONE aligned vector load:
  no gathers, no transposes, only static width-1 lane slices (measured
  supported + fast on v5e Mosaic);
- rays are processed 128 per row (the lane axis). Each row runs branch-free
  phases: supercluster cull -> cluster cull (8 AABBs per (8,128) slab test,
  hit bits packed into scalar words) -> branchless queue compaction -> Möller–
  Trumbore ((8 tris,1) x (1,128 rays)) over exactly the queued clusters, with
  the attribute interpolation gated per cluster behind one lax.cond;
- the caller seeds best_t with the sphere/quad winner (ops/pallas_hit.py), so
  closer non-triangle geometry culls cluster visits for free.

Intersection math matches _tri_block (ops/intersect.py; mesh.rs:50-82) exactly.
Misses return t = BIG. Packet-level divergence means a row visits the union of
its 128 rays' clusters — the SAH cut (not Morton) is what keeps that union small.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # plain float (a jnp scalar would be a captured constant)
BIG_IDF = float(1 << 24)  # id sentinel, exact in f32
LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES  # rays per grid step

CLUSTER_TRIS = 64  # must equal ops.bvh.CLUSTER_MAX (asserted below)
SUPER_CLUSTERS = 64  # clusters per supercluster (phase-0 cull granularity)
N_FIELDS = 16  # lane stride per triangle slot
# field offsets within a slot: v0(3), e1(3), e2(3), id
F_V0, F_E1, F_E2, F_ID = 0, 3, 6, 9

# VMEM budget for the packed table (v5e has ~16 MB; leave room for ray tiles)
MAX_PACKED_BYTES = 8 << 20

from .bvh import CLUSTER_MAX as _CLUSTER_MAX  # noqa: E402

assert CLUSTER_TRIS == _CLUSTER_MAX, "packed layout assumes the SAH cluster cut size"


HAS_UV_FLAG = float(1 << 20)  # added to the mat field when the triangle has UVs


def pack_clusters(tri_v0, tri_e1, tri_e2, clusters, tri_n0=None, tri_n1=None,
                  tri_n2=None, tri_uv0=None, tri_uv1=None, tri_uv2=None,
                  tri_has_uv=None, tri_mat=None, sc_size=SUPER_CLUSTERS):
    """Pack SAH clusters into the kernel's VMEM layout.

    Inputs are the triangle tables already in SAH DFS order. Returns
    (cl_box [Cp, 8] f32, pk [Cp*8, 128] f32, pk2 [Cp*8, 128] f32) with Cp = C
    padded to a multiple of 8. Pad clusters get point AABBs at +1e30 (slab test
    can never pass) and pad triangle slots are degenerate (e1 = e2 = 0 ->
    |a| < 1e-8 reject).

    pk slot fields: v0(3), e1(3), e2(3), id.
    pk2 slot fields (shading attributes, so the kernel can interpolate normals
    and UVs at hit time instead of the render loop gathering 16k-row tables —
    XLA per-lane gathers measured ~microseconds/lane on TPU):
    n0(3), n1(3), n2(3), uv0(2), uv1(2), uv2(2), mat + HAS_UV_FLAG.
    """
    assert sc_size % 8 == 0 and sc_size >= 8, "supercluster = whole cull blocks"
    c_real = clusters["start"].shape[0]
    # pad cluster count to a full supercluster so phase-1 block loops never run
    # off the table (sc_size clusters = sc_size/8 cull blocks per supercluster;
    # 64 for VMEM scenes, smaller for HBM scenes — round-5 A/B, the in-kernel
    # phase-2 scalar compact walks sc_size iterations per hit supercluster).
    # The +1 guarantees at least one pad cluster exists: the HBM kernel uses
    # the last cluster as a degenerate queue-padding target (zero edges, far box).
    cp = max(sc_size, ((c_real + 1 + sc_size - 1) // sc_size) * sc_size)

    cl_box = np.full((cp, 8), 0.0, dtype=np.float32)
    cl_box[:, 0:3] = 1e30  # pad rows: point box far away
    cl_box[:, 3:6] = 1e30
    cl_box[:c_real, 0:3] = clusters["bmin"]
    cl_box[:c_real, 3:6] = clusters["bmax"]

    # supercluster level: unions of sc_size consecutive clusters — the
    # kernel's phase 0 culls these first so coherent rows skip whole swaths
    # of the per-cluster cull + compaction (its fixed cost dominated v2)
    n_sc = (cp + sc_size - 1) // sc_size
    scp = max(8, ((n_sc + 7) // 8) * 8)
    sc_box = np.full((scp, 8), 0.0, dtype=np.float32)
    sc_box[:, 0:3] = 1e30
    sc_box[:, 3:6] = 1e30
    for s in range(n_sc):
        lo_r, hi_r = s * sc_size, min((s + 1) * sc_size, c_real)
        if lo_r >= hi_r:
            continue
        sc_box[s, 0:3] = clusters["bmin"][lo_r:hi_r].min(0)
        sc_box[s, 3:6] = clusters["bmax"][lo_r:hi_r].max(0)

    pk = np.zeros((cp * 8, 128), dtype=np.float32)
    pk2 = np.zeros((cp * 8, 128), dtype=np.float32)
    local = np.arange(CLUSTER_TRIS)
    slot = local // 8  # lane group
    row = local % 8  # sublane
    fields = (
        tri_v0[:, 0], tri_v0[:, 1], tri_v0[:, 2],
        tri_e1[:, 0], tri_e1[:, 1], tri_e1[:, 2],
        tri_e2[:, 0], tri_e2[:, 1], tri_e2[:, 2],
    )
    n = tri_v0.shape[0]
    if tri_n0 is None:
        tri_n0 = tri_n1 = tri_n2 = np.zeros((n, 3), np.float32)
        tri_uv0 = tri_uv1 = tri_uv2 = np.zeros((n, 2), np.float32)
        tri_has_uv = np.zeros(n, bool)
        tri_mat = np.zeros(n, np.int32)
    matf = tri_mat.astype(np.float32) + tri_has_uv.astype(np.float32) * HAS_UV_FLAG
    fields2 = (
        tri_n0[:, 0], tri_n0[:, 1], tri_n0[:, 2],
        tri_n1[:, 0], tri_n1[:, 1], tri_n1[:, 2],
        tri_n2[:, 0], tri_n2[:, 1], tri_n2[:, 2],
        tri_uv0[:, 0], tri_uv0[:, 1],
        tri_uv1[:, 0], tri_uv1[:, 1],
        tri_uv2[:, 0], tri_uv2[:, 1],
        matf,
    )
    # vectorized packing over (cluster, local-slot): [C, 64] index arithmetic
    # (the per-cluster python loop cost minutes at 318k tris / ~5k clusters)
    starts = clusters["start"].astype(np.int64)[:, None]  # [C,1]
    counts = clusters["count"].astype(np.int64)[:, None]
    valid = local[None, :] < counts  # [C,64]
    gi = starts + np.where(valid, local[None, :], 0)
    rows = (np.arange(c_real, dtype=np.int64)[:, None] * 8 + row[None, :])  # [C,64]
    lanes = slot[None, :] * N_FIELDS  # [1,64] broadcast
    rv, cv = rows[valid], np.broadcast_to(lanes, rows.shape)[valid]
    giv = gi[valid]
    for f, col in enumerate(fields):
        pk[rv, cv + f] = col[giv]
    pk[rows, lanes + F_ID] = np.where(valid, gi, BIG_IDF)
    for f, col in enumerate(fields2):
        pk2[rv, cv + f] = col[giv]
    pk[c_real * 8 :, F_ID::N_FIELDS] = BIG_IDF
    return cl_box, pk, pk2, sc_box


RECULL_CHUNK = 8  # queued clusters per best-t re-cull (phase 3 chunking)


def _supercull_order(scl, ox, oy, oz, dx, dy, dz, tin, tmin, sort):
    """Phase 0, hoisted OUT of the kernel into plain XLA (round-4 redesign).

    For every 128-lane kernel row, slab-test all superclusters against the
    row's rays and return the visit queue the kernel should walk:

      order  (R, S) int32 — hit superclusters first; when `sort` they are
             front-to-back by nearest-lane entry distance (the packet-kernel
             analog of ordered BVH traversal, bvh.rs:124-163 — the recursive
             walk shrinks its t-interval as it descends, so near geometry is
             intersected first and far boxes fail the interval test);
      counts (R, 1) int32 — number of hit superclusters in the row.

    Round-3 history: ordering was first attempted as an in-kernel scalar
    insertion sort over SMEM queue entries keyed by dynamic scalar reads of a
    VMEM key array inside a lax.while_loop. Interpret mode accepted it; REAL
    Mosaic faulted (`ABORTED: TPU backend error`, deterministic on scene 6) and
    the fault wedged the whole bench process. Hoisting phase 0 to XLA is the
    structural fix: the sort is a trivially-vectorized argsort over (R, S)
    keys, the kernel never touches float keys or while_loops, AND the per-row
    fixed cost of phase 0 (which ran per row regardless of queue length)
    leaves the kernel entirely.

    Inputs are the kernel's own plane layout ((R, 128) f32) and the exact slab
    arithmetic the in-kernel phase 0 used — identical IEEE f32 ops, so the
    cull/no-cull decisions match the old kernel bit-for-bit. Pad lanes carry
    t_in = 0 < tmin and can never register a hit.
    """
    def inv(dc):
        return 1.0 / jnp.where(jnp.abs(dc) < 1e-20, jnp.where(dc < 0, -1e-20, 1e-20), dc)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    def slab(lo, hi, o, i):
        t1 = (lo[None, :, None] - o[:, None, :]) * i[:, None, :]
        t2 = (hi[None, :, None] - o[:, None, :]) * i[:, None, :]
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    n1, f1 = slab(scl[:, 0], scl[:, 3], ox, ix)
    n2, f2 = slab(scl[:, 1], scl[:, 4], oy, iy)
    n3, f3 = slab(scl[:, 2], scl[:, 5], oz, iz)
    tn = jnp.maximum(jnp.maximum(n1, n2), jnp.maximum(n3, tmin))
    tf = jnp.minimum(jnp.minimum(f1, f2), jnp.minimum(f3, tin[:, None, :]))
    hit = tn <= tf  # (R, S, 128)
    anyhit = jnp.any(hit, axis=2)  # (R, S)
    if sort:
        key = jnp.min(jnp.where(hit, tn, BIG), axis=2)  # nearest-lane entry
    else:
        key = jnp.broadcast_to(
            jnp.arange(scl.shape[0], dtype=jnp.float32)[None, :], anyhit.shape
        )  # index order (matches the old in-kernel compaction exactly)
    key = jnp.where(anyhit, key, jnp.inf)
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    counts = jnp.sum(anyhit, axis=1, dtype=jnp.int32)[:, None]
    return order, counts


def _cluster_queue(cl, ox, oy, oz, dx, dy, dz, tin, tmin, sort, pad_cluster,
                   want_key=False):
    """cqx mode: the per-row CLUSTER visit queue, computed in plain XLA.

    Same contract as _supercull_order but at cluster granularity, which lets
    the kernel drop phases 1-2 entirely (round-4 decomposition measured them at
    ~3.3 of the 10.5 us/row on worst-case rows: ~1 us of slab_word vector work
    plus ~2 us of serial scalar compaction). The dense C-cluster cull costs
    C x ~25 lane-ops per ray of fully-parallel XLA work, so it only pays for
    small cluster tables — the caller gates it (CQX_MAX_CLUSTERS); bigger
    scenes keep the hierarchical supercluster path.

    Entries at positions >= the row's hit count are set to `pad_cluster` (a
    guaranteed-degenerate cluster: +1e30 point box, zero-edge triangles, id
    BIG_IDF) so the kernel's pair loop can over-read safely.
    """
    def inv(dc):
        return 1.0 / jnp.where(jnp.abs(dc) < 1e-20, jnp.where(dc < 0, -1e-20, 1e-20), dc)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    def chunk_cull(cl_chunk):
        """(Cc, 8) boxes -> anyhit (R, Cc), nearest-entry key (R, Cc)."""

        def slab(lo, hi, o, i):
            t1 = (lo[None, :, None] - o[:, None, :]) * i[:, None, :]
            t2 = (hi[None, :, None] - o[:, None, :]) * i[:, None, :]
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        n1, f1 = slab(cl_chunk[:, 0], cl_chunk[:, 3], ox, ix)
        n2, f2 = slab(cl_chunk[:, 1], cl_chunk[:, 4], oy, iy)
        n3, f3 = slab(cl_chunk[:, 2], cl_chunk[:, 5], oz, iz)
        tn = jnp.maximum(jnp.maximum(n1, n2), jnp.maximum(n3, tmin))
        tf = jnp.minimum(jnp.minimum(f1, f2), jnp.minimum(f3, tin[:, None, :]))
        hit = tn <= tf  # (R, Cc, 128)
        return jnp.any(hit, axis=2), jnp.min(jnp.where(hit, tn, BIG), axis=2)

    C = cl.shape[0]
    CHUNK = 1024  # memory bound: the (R, Cc, 128) intermediates at C=32k rows
    if C <= CHUNK:
        anyhit, tn_key = chunk_cull(cl)
    else:
        # lax.map over cluster chunks keeps peak memory at (R, CHUNK, 128)
        # instead of (R, C, 128) — 7.5 GB of f32 temporaries at C~7k, R~2k
        cpad = (-C) % CHUNK
        cl_p = jnp.pad(cl, ((0, cpad), (0, 0)), constant_values=1e30)
        ah, tk = jax.lax.map(chunk_cull, cl_p.reshape(-1, CHUNK, cl.shape[1]))
        anyhit = jnp.moveaxis(ah, 0, 1).reshape(ox.shape[0], -1)[:, :C]
        tn_key = jnp.moveaxis(tk, 0, 1).reshape(ox.shape[0], -1)[:, :C]
    if sort:
        key = tn_key
    else:
        key = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.float32)[None, :], anyhit.shape
        )
    key = jnp.where(anyhit, key, jnp.inf)
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    counts = jnp.sum(anyhit, axis=1, dtype=jnp.int32)[:, None]
    pos = jnp.arange(order.shape[1], dtype=jnp.int32)[None, :]
    skey = None
    if want_key:
        # sorted entry keys, for the kernel's ordered-traversal gate: a
        # triangle hit in cluster order[i] by ANY lane has t >= skey[i] (the
        # row's nearest lane entry), so once every lane's best_t <= skey[i],
        # clusters i.. can't improve and are skipped. Positions >= count carry
        # BIG (never pass). ONLY computed when the gate asks: the
        # take_along_axis is a per-row gather and measurably slows the default
        # path (STUB probe 22.3M vs 119.8M rows/s preamble — round 4).
        skey = jnp.take_along_axis(key, order, axis=1)
        skey = jnp.where(pos < counts, skey.astype(jnp.float32), BIG)
    order = jnp.where(pos < counts, order, jnp.int32(pad_cluster))
    return order, counts, skey


# cqx (cluster-queue-from-XLA) pays while the dense per-lane cluster cull is
# cheaper than the in-kernel phases 1-2 it replaces; gate by table size.
CQX_MAX_CLUSTERS = 768
# cqx for HBM scenes (round 5, TPUPT_CQX_HBM=1): phases 1-2 measured 67% of
# the worst-case HBM row cost, but the dense XLA cull + (R, C) argsort cost
# scales with C — the cap bounds the experiment to ~512k tris.
CQX_HBM_MAX_CLUSTERS = 8192


def _tri_cluster_kernel(tmin_ref, scq_ref, scn_ref, kq_ref, cl_ref, pk_ref, pk2_ref,
                        ox, oy, oz, dx, dy, dz,
                        tin, t_out, id_out, nx_out, ny_out, nz_out, uu_out, vv_out, mat_out,
                        vword, squeue, *, n_cl_blocks, pad_cluster, recull, pair, cqx,
                        gate, sc_blocks=SUPER_CLUSTERS // 8):
    """Branch-free phases per 128-ray row (measured: per-cluster lax.cond +
    scalar readback cost ~65 cycles each and dominated v1 — see BASELINE.md):

    0. supercull — hoisted to XLA (see _supercull_order): the kernel receives
       each row's supercluster visit queue (scq_ref, front-to-back when the
       caller sorted it) and hit count (scn_ref) as blocked SMEM inputs;
    1. cull (vector): for hit superclusters only, slab-test 8 clusters at a
       time; pack the 8 any-lane-hit bits into one word in VMEM scratch;
    2. compact (scalar, branchless): squeue[qn] = cluster; qn += bit — a queue
       of hit clusters with zero branches;
    3. intersect (vector): fori over the queued clusters. With `recull`, the
       loop is chunked: phase 1's cull ran against the *seed* best-t; as
       triangles land, the carry's best-t tightens, so before each chunk of
       RECULL_CHUNK clusters their AABBs are re-slab-tested against the current
       per-lane best-t and the whole chunk is lax.cond-skipped when no lane can
       improve (conservative up to f32 rounding: a triangle hit inside a box
       has t >= the box entry distance). Chunking amortizes the cond (~65
       cycles, which sank the round-2 per-cluster variant: 10.8 -> 9.5M) over
       8 clusters of real work. Re-culling only pays when the queue is in
       front-to-back order — near superclusters first means best_t tightens
       early and far chunks die; in plain DFS order it measured -7% (round 3).

    Tie semantics: with sorting, clusters are tested in near-supercluster-first
    order, so an EXACT t tie between triangles in different superclusters can
    resolve to a different winner than the dense sweep's lowest-id rule. Exact
    f32 ties across distinct triangles only occur for rays through shared
    edges — measure-zero for sampled paths.

    A half-cluster variant (cull and queue 32-triangle halves with tighter
    AABBs, two static-slot queues) was built and REJECTED in round 3: 9.66M vs
    11.72M worst-case — DFS slot halves are not tight enough, so queue entries
    nearly doubled while per-entry fixed costs (block load, cond, loop step)
    doubled outright.
    """
    tmin = tmin_ref[0]
    kbit = 1 << jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, 1), 0)  # 2^k column
    for rr in range(SUBLANES):  # 8 rows of 128 rays per grid step
        o_x = ox[rr : rr + 1, :]
        o_y = oy[rr : rr + 1, :]
        o_z = oz[rr : rr + 1, :]
        d_x = dx[rr : rr + 1, :]
        d_y = dy[rr : rr + 1, :]
        d_z = dz[rr : rr + 1, :]
        # sign-preserving flush of tiny components (ops/bvh.py slab test parity)
        inv_x = 1.0 / jnp.where(jnp.abs(d_x) < 1e-20, jnp.where(d_x < 0, -1e-20, 1e-20), d_x)
        inv_y = 1.0 / jnp.where(jnp.abs(d_y) < 1e-20, jnp.where(d_y < 0, -1e-20, 1e-20), d_y)
        inv_z = 1.0 / jnp.where(jnp.abs(d_z) < 1e-20, jnp.where(d_z < 0, -1e-20, 1e-20), d_z)
        t_seed = tin[rr : rr + 1, :]

        def slab_tn_tf(bx, t_lim, o_x=o_x, o_y=o_y, o_z=o_z,
                       inv_x=inv_x, inv_y=inv_y, inv_z=inv_z):
            """Slab intervals of (N,8) boxes vs this row's rays -> tn, tf (N,128)."""
            t1x = (bx[:, 0:1] - o_x) * inv_x
            t2x = (bx[:, 3:4] - o_x) * inv_x
            t1y = (bx[:, 1:2] - o_y) * inv_y
            t2y = (bx[:, 4:5] - o_y) * inv_y
            t1z = (bx[:, 2:3] - o_z) * inv_z
            t2z = (bx[:, 5:6] - o_z) * inv_z
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.maximum(jnp.minimum(t1z, t2z), tmin),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.minimum(jnp.maximum(t1z, t2z), t_lim),
            )
            return tn, tf

        def slab_word(box_ref, blk, t_seed=t_seed):
            """Slab-test 8 boxes of `box_ref` at block `blk` -> (1,1) bit word."""
            bx = box_ref[pl.ds(blk * 8, 8), :]  # (8 boxes, 8 fields)
            tn, tf = slab_tn_tf(bx, t_seed)
            hit = jnp.any(tn <= tf, axis=1, keepdims=True)  # (8,1)
            return jnp.sum(jnp.where(hit, kbit, 0), axis=0, keepdims=True)  # (1,1)

        if cqx:
            # ---- cqx mode: the CLUSTER queue itself came from XLA
            # (_cluster_queue) — phases 1-2 vanish from the kernel entirely;
            # entries beyond the count are the degenerate pad cluster ----
            qn = scn_ref[rr, 0]

            def qread(i):
                return scq_ref[rr, i]
        else:
            # ---- phase 0 ran in XLA (_supercull_order); read this row's queue ----
            sqn = scn_ref[rr, 0]

            # ---- phase 1: cull the hit superclusters' cluster blocks ----
            def cull_body(i, _):
                s = scq_ref[rr, i]  # supercluster -> its sc_blocks cull blocks
                for j in range(sc_blocks):
                    cb = s * sc_blocks + j
                    vword[pl.ds(cb, 1), 0:1] = slab_word(cl_ref, cb)
                return 0

            lax.fori_loop(0, sqn, cull_body, 0)

            # ---- phase 2: branchless compaction into the SMEM cluster queue ----
            def compact_body(i, qn):
                s = scq_ref[rr, i]
                for j in range(sc_blocks):
                    cb = s * sc_blocks + j
                    word = vword[cb, 0]
                    for k in range(8):
                        squeue[qn] = cb * 8 + k
                        qn = qn + ((word >> k) & 1)
                return qn

            qn = lax.fori_loop(0, sqn, compact_body, jnp.int32(0))

            def qread(i):
                return squeue[i]

        if recull:
            # pad the last partial chunk so rechecks read valid cluster ids
            # (pad triangles are degenerate and the fori below is bounded by
            # qn, so pad entries are never intersected; their boxes at +1e30
            # keep chunk gates conservative)
            for j in range(RECULL_CHUNK):
                squeue[qn + j] = pad_cluster

        # ---- phase 3: Möller–Trumbore over queued clusters, chunk-gated.
        # Shading attributes (normals, UVs, material) are interpolated HERE, at
        # candidate level, and carried through the same select-chain as t/id —
        # this replaces the render loop's per-lane XLA gathers over the 16k-row
        # attribute tables (hit_info/mesh.rs:84-101 semantics, measured ~us/lane
        # on TPU; the select-chain costs ~2x the bare intersection and is the
        # difference between 0.5M and multi-M rays/s on mesh scenes).
        def mt_cands(c, best_t, o_x=o_x, o_y=o_y, o_z=o_z, d_x=d_x, d_y=d_y, d_z=d_z):
            """Phase A: Möller–Trumbore over the cluster's 8 slots, carrying the
            candidate's (t, id, bary u, bary v, slot). Attributes are fetched in
            phase B, gated per cluster, because most box-hit clusters yield no
            triangle hit and attribute selection costs ~2x the MT test."""
            blk = pk_ref[pl.ds(c * 8, 8), :]  # (8,128): one cluster, geometry
            cand_t = jnp.full((SUBLANES, LANES), BIG, jnp.float32)
            cand_id = jnp.full((SUBLANES, LANES), BIG_IDF, jnp.float32)
            zeros = jnp.zeros((SUBLANES, LANES), jnp.float32)
            cand_u, cand_v, cand_g = zeros, zeros, zeros
            for g in range(8):  # 8 triangle slots of 8 rows each
                base = g * N_FIELDS
                v0x = blk[:, base + 0 : base + 1]
                v0y = blk[:, base + 1 : base + 2]
                v0z = blk[:, base + 2 : base + 3]
                e1x = blk[:, base + 3 : base + 4]
                e1y = blk[:, base + 4 : base + 5]
                e1z = blk[:, base + 5 : base + 6]
                e2x = blk[:, base + 6 : base + 7]
                e2y = blk[:, base + 7 : base + 8]
                e2z = blk[:, base + 8 : base + 9]
                idf = blk[:, base + 9 : base + 10]
                # Möller–Trumbore (mesh.rs:50-82), (8 tris,1) x (1,128 rays)
                hx = d_y * e2z - d_z * e2y
                hy = d_z * e2x - d_x * e2z
                hz = d_x * e2y - d_y * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
                sx = o_x - v0x
                sy = o_y - v0y
                sz = o_z - v0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (d_x * qx + d_y * qy + d_z * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = (
                    (jnp.abs(a) >= 1e-8)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > tmin)
                    & (t < best_t)
                )
                upd = ok & (t < cand_t)
                cand_t = jnp.where(upd, t, cand_t)
                cand_id = jnp.where(upd, idf, cand_id)
                cand_u = jnp.where(upd, u, cand_u)
                cand_v = jnp.where(upd, v, cand_v)
                cand_g = jnp.where(upd, float(g), cand_g)
            return cand_t, cand_id, cand_u, cand_v, cand_g

        def apply_phase_b(best, c, cands):
            """Gated phase B: fold the cluster's best candidate (with its
            interpolated shading attributes) into the running best."""
            cand_t, cand_id, cand_u, cand_v, cand_g = cands

            def phase_b(best, blk_c=c):
                best_t = best[0]
                blk2 = pk2_ref[pl.ds(blk_c * 8, 8), :]  # (8,128): shading attrs
                row_t = jnp.min(cand_t, axis=0, keepdims=True)
                row_id = jnp.min(
                    jnp.where(cand_t <= row_t, cand_id, BIG_IDF), axis=0, keepdims=True
                )
                # select the winner's 15 attribute fields by slot comparison
                attr = [jnp.zeros((SUBLANES, LANES), jnp.float32) for _ in range(16)]
                for g in range(8):
                    sel = cand_g == float(g)
                    base = g * N_FIELDS
                    for fidx in range(16):
                        attr[fidx] = jnp.where(
                            sel, blk2[:, base + fidx : base + fidx + 1], attr[fidx]
                        )
                # barycentric interpolation of normals/UVs (mesh.rs:84-101)
                w = 1.0 - cand_u - cand_v
                n_x = attr[0] * w + attr[3] * cand_u + attr[6] * cand_v
                n_y = attr[1] * w + attr[4] * cand_u + attr[7] * cand_v
                n_z = attr[2] * w + attr[5] * cand_u + attr[8] * cand_v
                matf = attr[15]
                has_uv = matf >= HAS_UV_FLAG
                uu = jnp.where(
                    has_uv, attr[9] * w + attr[11] * cand_u + attr[13] * cand_v, cand_u
                )
                vv = jnp.where(
                    has_uv, attr[10] * w + attr[12] * cand_u + attr[14] * cand_v, cand_v
                )
                # exactly one (row, lane) matches row_id: sum-select its values
                exact = cand_id == row_id
                upd = row_t < best_t
                out = [
                    jnp.where(upd, row_t, best[0]),
                    jnp.where(upd, row_id, best[1]),
                ]
                for fld in (n_x, n_y, n_z, uu, vv, matf):
                    row_f = jnp.sum(jnp.where(exact, fld, 0.0), axis=0, keepdims=True)
                    out.append(jnp.where(upd, row_f, best[len(out)]))
                return tuple(out)

            return lax.cond(jnp.any(cand_id < BIG_IDF), phase_b, lambda b: b, best)

        def tri_body(i, carry):
            c = qread(i)
            return apply_phase_b(carry, c, mt_cands(c, carry[0]))

        def tri_pair_body(p, carry):
            """Two clusters per iteration with INDEPENDENT phase-A chains.

            Round-4 decomposition (BASELINE.md): phase 3 ran at ~450 cycles per
            cluster ≈ its ~496 tile-op count — ONE vector op per cycle, i.e.
            the 62-op-per-slot dependency chain serializes the VPU. Computing
            two clusters' candidates from the same pre-pair best_t gives the
            scheduler two independent chains to interleave. Correctness: the
            looser best_t only ADDS candidates; each apply_phase_b re-checks
            row_t < best[0] against the updated best, and the strict < keeps
            the earlier queue position on exact ties, matching the sequential
            semantics."""
            c0 = qread(2 * p)
            c1 = qread(2 * p + 1)
            best_t = carry[0]
            cands0 = mt_cands(c0, best_t)
            cands1 = mt_cands(c1, best_t)
            best = apply_phase_b(carry, c0, cands0)
            return apply_phase_b(best, c1, cands1)

        def chunk_body(ci, best):
            lo = ci * RECULL_CHUNK
            # gather the chunk's 8 cluster AABBs and slab-test them against the
            # carry's current best-t (tighter than phase 1's seed)
            bx = jnp.concatenate(
                [cl_ref[pl.ds(qread(lo + j), 1), :] for j in range(RECULL_CHUNK)],
                axis=0,
            )  # (8, 8)
            tn, tf = slab_tn_tf(bx, best[0])

            def run(b):
                return lax.fori_loop(lo, jnp.minimum(lo + RECULL_CHUNK, qn), tri_body, b)

            return lax.cond(jnp.any(tn <= tf), run, lambda b: b, best)

        zrow = jnp.zeros((1, LANES), jnp.float32)
        init = (t_seed, jnp.full((1, LANES), BIG_IDF, jnp.float32),
                zrow, zrow, zrow, zrow, zrow, zrow)
        if recull:
            n_chunks = (qn + RECULL_CHUNK - 1) // RECULL_CHUNK
            best = lax.fori_loop(0, n_chunks, chunk_body, init)
        elif pair:
            # pad an odd queue with the degenerate pad cluster (zero edges
            # reject in phase A; id stays BIG_IDF so phase B never fires).
            # cqx queues arrive pre-padded from XLA.
            if not cqx:
                squeue[qn] = pad_cluster
            if gate:
                # ordered-traversal gate (bvh.rs:124-163's shrinking t-interval,
                # exact): the queue is front-to-back by row entry key, and a
                # triangle hit in cluster order[i] has t >= skey[i] for every
                # lane, so once max(best_t) <= skey[2p] the pair (and, by
                # monotonicity, every later pair — each skipped by its own
                # cheap cond) cannot improve any lane. Dead lanes carry
                # best_t = t_in = 0 and never hold the gate open.
                def gated_pair(p, carry):
                    def run(b, p=p):
                        return tri_pair_body(p, b)

                    return lax.cond(
                        jnp.max(carry[0]) > kq_ref[rr, 2 * p], run, lambda b: b, carry
                    )

                best = lax.fori_loop(0, (qn + 1) // 2, gated_pair, init)
            else:
                best = lax.fori_loop(0, (qn + 1) // 2, tri_pair_body, init)
        else:
            best = lax.fori_loop(0, qn, tri_body, init)
        # report BIG where no triangle beat the seed (caller min-selects kinds)
        found = best[1] < BIG_IDF
        t_out[rr : rr + 1, :] = jnp.where(found, best[0], BIG)
        id_out[rr : rr + 1, :] = jnp.where(found, best[1], 0.0).astype(jnp.int32)
        nx_out[rr : rr + 1, :] = best[2]
        ny_out[rr : rr + 1, :] = best[3]
        nz_out[rr : rr + 1, :] = best[4]
        uu_out[rr : rr + 1, :] = best[5]
        vv_out[rr : rr + 1, :] = best[6]
        mat_out[rr : rr + 1, :] = jnp.where(
            best[7] >= HAS_UV_FLAG, best[7] - HAS_UV_FLAG, best[7]
        ).astype(jnp.int32)



# HBM-resident variant (VERDICT round-2 item 5): the SMEM cluster-queue
# scratch (4 B/cluster) bounds the scene size; beyond it the compiler falls
# back to the dense sweep. Round 4 lifted the bound from 8192 (512k tris) to
# 32768 clusters (~2M tris, 128 KB queue) after tools/probe_bigmesh_cap.py
# compiled and hit-matched a 1.27M-tri mesh on real Mosaic. The reference's
# heap BVHs are unbounded (mesh.rs:149-197); past this cap a two-level paged
# queue would be the next step.
MAX_HBM_CLUSTERS = 32768


def _tri_cluster_kernel_hbm(
    tmin_ref, scq_ref, scn_ref, kq_ref, cl_ref, pk_hbm, pk2_hbm, ox, oy, oz, dx, dy, dz,
    tin, t_out, id_out, nx_out, ny_out, nz_out, uu_out, vv_out, mat_out,
    vword, squeue, dbuf, dsem, *, n_cl_blocks, pad_cluster, nop3=False,
    sc_blocks=SUPER_CLUSTERS // 8, n_slots=2, cqx=False,
):
    """The cluster packet kernel with pk/pk2 resident in HBM.

    Same phases as _tri_cluster_kernel (cluster/supercluster AABBs stay VMEM-
    resident — 32 B/cluster, tiny at any scene size; phase 0 runs in XLA via
    _supercull_order, so front-to-back ordering works at ANY supercluster
    count); what changes is phase 3:
    each queued cluster's geometry (8,128) AND shading (8,128) blocks are
    staged through a double-buffered VMEM scratch by async DMA, with the next
    cluster's copy in flight while the current one is intersected. Clusters are
    processed in slot pairs with STATIC scratch offsets (Mosaic-friendly: no
    dynamic semaphore indexing); an odd queue is padded with `pad_cluster` —
    a guaranteed-degenerate pad cluster (zero edges reject in phase A, far box
    never culled in) — so the pair loop runs unconditionally.

    Bandwidth budget: 8 KB per queued cluster per row; an incoherent row
    queueing ~64 clusters moves ~0.5 MB per 1024 rays (~4 KB/ray), far under
    HBM speed-of-light for the accompanying compute.
    """
    tmin = tmin_ref[0]
    kbit = 1 << jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, 1), 0)
    for rr in range(SUBLANES):
        o_x = ox[rr : rr + 1, :]
        o_y = oy[rr : rr + 1, :]
        o_z = oz[rr : rr + 1, :]
        d_x = dx[rr : rr + 1, :]
        d_y = dy[rr : rr + 1, :]
        d_z = dz[rr : rr + 1, :]
        inv_x = 1.0 / jnp.where(jnp.abs(d_x) < 1e-20, jnp.where(d_x < 0, -1e-20, 1e-20), d_x)
        inv_y = 1.0 / jnp.where(jnp.abs(d_y) < 1e-20, jnp.where(d_y < 0, -1e-20, 1e-20), d_y)
        inv_z = 1.0 / jnp.where(jnp.abs(d_z) < 1e-20, jnp.where(d_z < 0, -1e-20, 1e-20), d_z)
        t_seed = tin[rr : rr + 1, :]

        def slab_word(box_ref, blk, o_x=o_x, o_y=o_y, o_z=o_z,
                      inv_x=inv_x, inv_y=inv_y, inv_z=inv_z, t_seed=t_seed):
            bx = box_ref[pl.ds(blk * 8, 8), :]
            t1x = (bx[:, 0:1] - o_x) * inv_x
            t2x = (bx[:, 3:4] - o_x) * inv_x
            t1y = (bx[:, 1:2] - o_y) * inv_y
            t2y = (bx[:, 4:5] - o_y) * inv_y
            t1z = (bx[:, 2:3] - o_z) * inv_z
            t2z = (bx[:, 5:6] - o_z) * inv_z
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.maximum(jnp.minimum(t1z, t2z), tmin),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.minimum(jnp.maximum(t1z, t2z), t_seed),
            )
            hit = jnp.any(tn <= tf, axis=1, keepdims=True)
            return jnp.sum(jnp.where(hit, kbit, 0), axis=0, keepdims=True)

        if cqx:
            # ---- cqx-hbm (round 5): the CLUSTER queue itself came from XLA
            # (_cluster_queue, chunked dense cull) — phases 1-2 vanish; queue
            # entries beyond the count are the degenerate pad cluster, so the
            # n_slots padding is already in place ----
            qn = scn_ref[rr, 0]

            def qread(i):
                return scq_ref[rr, i]
        else:
            # ---- phases 1-2: identical cull/compact structure to the VMEM
            # kernel (phase 0 ran in XLA; queue arrives in scq_ref/scn_ref) ----
            sqn = scn_ref[rr, 0]

            def cull_body(i, _):
                s = scq_ref[rr, i]
                for j in range(sc_blocks):
                    cb = s * sc_blocks + j
                    vword[pl.ds(cb, 1), 0:1] = slab_word(cl_ref, cb)
                return 0

            lax.fori_loop(0, sqn, cull_body, 0)

            wordgate = os.environ.get("TPUPT_TRI_WORDGATE", "0") == "1"

            def compact_body(i, qn):
                s = scq_ref[rr, i]
                for j in range(sc_blocks):
                    cb = s * sc_blocks + j
                    word = vword[cb, 0]
                    if wordgate:
                        # skip the 8 scalar steps for all-miss words (most of
                        # them at sc=16: ~14 hit clusters over ~100 words on
                        # worst-case bigmesh rows). Probe-gated: lax.cond at
                        # this granularity cost ~65 cy in round 2.
                        def w_run(qn, cb=cb, word=word):
                            for k in range(8):
                                squeue[qn] = cb * 8 + k
                                qn = qn + ((word >> k) & 1)
                            return qn

                        qn = lax.cond(word != 0, w_run, lambda q: q, qn)
                    else:
                        for k in range(8):
                            squeue[qn] = cb * 8 + k
                            qn = qn + ((word >> k) & 1)
                return qn

            qn = lax.fori_loop(0, sqn, compact_body, jnp.int32(0))

            # pad the queue to a multiple of n_slots so the slot loop below is
            # unconditional (pad entries target the degenerate pad cluster)
            for _pj in range(n_slots - 1):
                squeue[qn + _pj] = pad_cluster

            def qread(i):
                return squeue[i]

        qn2 = ((qn + (n_slots - 1)) // n_slots) * n_slots
        if nop3:  # probe-only (TPUPT_TRI_NOP3): preamble + phases 1-2 cost
            qn2 = jnp.int32(0)

        # ---- phase 3: paired double-buffered DMA + Möller–Trumbore ----
        def start_dma(slot, qi):
            c = qread(qi)
            pltpu.make_async_copy(
                pk_hbm.at[pl.ds(c * 8, 8), :],
                dbuf.at[pl.ds(slot * 16, 8), :],
                dsem.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                pk2_hbm.at[pl.ds(c * 8, 8), :],
                dbuf.at[pl.ds(slot * 16 + 8, 8), :],
                dsem.at[slot, 1],
            ).start()

        def wait_dma(slot, qi):
            c = qread(qi)
            pltpu.make_async_copy(
                pk_hbm.at[pl.ds(c * 8, 8), :],
                dbuf.at[pl.ds(slot * 16, 8), :],
                dsem.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                pk2_hbm.at[pl.ds(c * 8, 8), :],
                dbuf.at[pl.ds(slot * 16 + 8, 8), :],
                dsem.at[slot, 1],
            ).wait()

        for _sl in range(n_slots):
            @pl.when(qn2 > _sl)
            def _(_sl=_sl):
                start_dma(_sl, _sl)

        def mt_slot(best_t, slot, o_x=o_x, o_y=o_y, o_z=o_z, d_x=d_x, d_y=d_y, d_z=d_z):
            """Phase A (MT) over the staged cluster in `slot` -> candidates."""
            blk = dbuf[pl.ds(slot * 16, 8), :]
            cand_t = jnp.full((SUBLANES, LANES), BIG, jnp.float32)
            cand_id = jnp.full((SUBLANES, LANES), BIG_IDF, jnp.float32)
            zeros = jnp.zeros((SUBLANES, LANES), jnp.float32)
            cand_u, cand_v, cand_g = zeros, zeros, zeros
            for g in range(8):
                base = g * N_FIELDS
                v0x = blk[:, base + 0 : base + 1]
                v0y = blk[:, base + 1 : base + 2]
                v0z = blk[:, base + 2 : base + 3]
                e1x = blk[:, base + 3 : base + 4]
                e1y = blk[:, base + 4 : base + 5]
                e1z = blk[:, base + 5 : base + 6]
                e2x = blk[:, base + 6 : base + 7]
                e2y = blk[:, base + 7 : base + 8]
                e2z = blk[:, base + 8 : base + 9]
                idf = blk[:, base + 9 : base + 10]
                hx = d_y * e2z - d_z * e2y
                hy = d_z * e2x - d_x * e2z
                hz = d_x * e2y - d_y * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
                sx = o_x - v0x
                sy = o_y - v0y
                sz = o_z - v0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (d_x * qx + d_y * qy + d_z * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = (
                    (jnp.abs(a) >= 1e-8)
                    & (u >= 0.0)
                    & (u <= 1.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > tmin)
                    & (t < best_t)
                )
                upd = ok & (t < cand_t)
                cand_t = jnp.where(upd, t, cand_t)
                cand_id = jnp.where(upd, idf, cand_id)
                cand_u = jnp.where(upd, u, cand_u)
                cand_v = jnp.where(upd, v, cand_v)
                cand_g = jnp.where(upd, float(g), cand_g)
            return cand_t, cand_id, cand_u, cand_v, cand_g

        def apply_phase_b(best, slot, cands):
            cand_t, cand_id, cand_u, cand_v, cand_g = cands

            def phase_b(best):
                best_t = best[0]
                blk2 = dbuf[pl.ds(slot * 16 + 8, 8), :]
                row_t = jnp.min(cand_t, axis=0, keepdims=True)
                row_id = jnp.min(
                    jnp.where(cand_t <= row_t, cand_id, BIG_IDF), axis=0, keepdims=True
                )
                attr = [jnp.zeros((SUBLANES, LANES), jnp.float32) for _ in range(16)]
                for g in range(8):
                    sel = cand_g == float(g)
                    base = g * N_FIELDS
                    for fidx in range(16):
                        attr[fidx] = jnp.where(
                            sel, blk2[:, base + fidx : base + fidx + 1], attr[fidx]
                        )
                w = 1.0 - cand_u - cand_v
                n_x = attr[0] * w + attr[3] * cand_u + attr[6] * cand_v
                n_y = attr[1] * w + attr[4] * cand_u + attr[7] * cand_v
                n_z = attr[2] * w + attr[5] * cand_u + attr[8] * cand_v
                matf = attr[15]
                has_uv = matf >= HAS_UV_FLAG
                uu = jnp.where(
                    has_uv, attr[9] * w + attr[11] * cand_u + attr[13] * cand_v, cand_u
                )
                vv = jnp.where(
                    has_uv, attr[10] * w + attr[12] * cand_u + attr[14] * cand_v, cand_v
                )
                exact = cand_id == row_id
                upd = row_t < best_t
                out = [
                    jnp.where(upd, row_t, best[0]),
                    jnp.where(upd, row_id, best[1]),
                ]
                for fld in (n_x, n_y, n_z, uu, vv, matf):
                    row_f = jnp.sum(jnp.where(exact, fld, 0.0), axis=0, keepdims=True)
                    out.append(jnp.where(upd, row_f, best[len(out)]))
                return tuple(out)

            return lax.cond(jnp.any(cand_id < BIG_IDF), phase_b, lambda b: b, best)

        def slot_body(j, best):
            """Serial per slot, DMA for entry i+n_slots issued as soon as slot
            s is consumed — an n_slots-deep prefetch ring. A round-4 variant
            that interleaved two slots' independent phase-A chains (the VMEM
            kernel's tri_pair_body win, +5%) was A/B'd on chip and REJECTED
            here: 3.19M vs 3.58M rays/s on the 318k-tri bigmesh — delaying the
            next DMA until after both phase Bs costs more overlap than the ILP
            recovers when the staging is HBM-latency-bound. Deeper rings
            (TPUPT_HBM_SLOTS=4) attack the same latency from the issue side:
            more copies in flight while each slot is consumed serially."""
            i0 = n_slots * j
            for _sl in range(n_slots):
                wait_dma(_sl, i0 + _sl)
                best = apply_phase_b(best, _sl, mt_slot(best[0], _sl))

                @pl.when(i0 + _sl + n_slots < qn2)
                def _(_sl=_sl):
                    start_dma(_sl, i0 + _sl + n_slots)

            return best

        zrow = jnp.zeros((1, LANES), jnp.float32)
        init = (t_seed, jnp.full((1, LANES), BIG_IDF, jnp.float32),
                zrow, zrow, zrow, zrow, zrow, zrow)
        best = lax.fori_loop(0, qn2 // n_slots, slot_body, init)
        found = best[1] < BIG_IDF
        t_out[rr : rr + 1, :] = jnp.where(found, best[0], BIG)
        id_out[rr : rr + 1, :] = jnp.where(found, best[1], 0.0).astype(jnp.int32)
        nx_out[rr : rr + 1, :] = best[2]
        ny_out[rr : rr + 1, :] = best[3]
        nz_out[rr : rr + 1, :] = best[4]
        uu_out[rr : rr + 1, :] = best[5]
        vv_out[rr : rr + 1, :] = best[6]
        mat_out[rr : rr + 1, :] = jnp.where(
            best[7] >= HAS_UV_FLAG, best[7] - HAS_UV_FLAG, best[7]
        ).astype(jnp.int32)


def pallas_closest_tri(sd, o, d, t_in, tmin, interpret=False, hbm=None,
                       sort=None, recull=None):
    """Closest triangle via cluster packets -> (t [B], idx [B] int32, aux dict).

    t_in seeds the per-lane best distance (pass the sphere/quad winner's t, or
    tmax): only triangles strictly closer are reported; misses carry t = BIG.
    idx indexes the SAH-reordered triangle tables. aux carries the winner's
    shading attributes (interpolated in-kernel): ns_raw [B,3] (unnormalized
    interpolated vertex normal), u [B], v [B], mat [B] int32 — so the render
    loop never gathers the big per-triangle attribute tables.

    hbm selects the HBM-resident kernel (packed tables stay in HBM, clusters
    DMA-staged through a double-buffered VMEM scratch); defaults to the scene
    compiler's routing (sd.has_tri_clusters_hbm).

    sort / recull override the TPUPT_TRI_SORT / TPUPT_TRI_RECULL env flags
    (both default on): front-to-back supercluster ordering (_supercull_order)
    and the chunked best-t re-cull in phase 3 (VMEM kernel only).
    """
    if hbm is None:
        hbm = sd.has_tri_clusters_hbm and not sd.has_tri_clusters
    b = o.shape[0]
    pad = (-b) % BLOCK
    bp = b + pad

    def plane(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(bp // LANES, LANES)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(t_in),  # pad lanes get t_in = 0 -> no box can pass tn >= tmin > 0
    ]
    n_cl_blocks = sd.tri_cl.shape[0] // 8

    # Diagnostic substitutions (probe-only; tools/probe_tri_kernel.py): isolate
    # the kernel's cost phases on chip without kernel-code variants. Applied
    # BEFORE the queue is built so the cqx path sees the substituted AABBs too
    # (ADVICE round-4: substituting after _cluster_queue left the queue fully
    # populated, corrupting probe cost attribution under the default cqx path).
    #   TPUPT_TRI_STUB=1  -> counts forced 0: per-row preamble+output cost only
    #   TPUPT_TRI_NOMT=1  -> cluster AABBs pushed to +1e30: cull phases run,
    #                        queue stays empty (no Moller-Trumbore work)
    tri_cl = sd.tri_cl
    if os.environ.get("TPUPT_TRI_NOMT", "") == "1":
        tri_cl = jnp.full_like(tri_cl, 1e30)

    # phase 0 in XLA: per-row supercluster visit queue, front-to-back unless
    # disabled for A/B (TPUPT_TRI_SORT=0). Flags are read at trace time.
    # Defaults from the round-4 on-chip A/B (BASELINE.md): sorting is free
    # (XLA-side argsort) and worth +0.6% end-to-end; the phase-3 re-cull costs
    # 2% even WITH front-to-back ordering (chunk gates rarely fire: a 128-lane
    # row's best-t union stays wide), so it defaults OFF.
    if sort is None:
        sort = os.environ.get("TPUPT_TRI_SORT", "1") == "1"
    if recull is None:
        recull = os.environ.get("TPUPT_TRI_RECULL", "0") == "1"
    # cqx: ship the CLUSTER queue from XLA and drop kernel phases 1-2 — only
    # for small tables (dense cull cost scales with C). HBM scenes opt in via
    # TPUPT_CQX_HBM=1 (round-5 experiment: the chunked dense cull + argsort
    # trades ~C x 25 lane-ops/ray of XLA work for the 67%-of-row-cost
    # in-kernel phases; A/B in BASELINE.md).
    if hbm:
        cqx_cap = (
            CQX_HBM_MAX_CLUSTERS
            if os.environ.get("TPUPT_CQX_HBM", "0") == "1"
            else 0
        )
    else:
        cqx_cap = CQX_MAX_CLUSTERS
    cqx = (
        not recull
        and sd.tri_cl.shape[0] <= cqx_cap
        and os.environ.get("TPUPT_TRI_CQX", "1") == "1"
    )
    # ordered-traversal gate: needs cqx (cluster-granular queue) + sorted keys
    # + the pair-interleaved phase 3 (the only branch that reads the gate — with
    # pair off the sorted-key gather would be paid for nothing; ADVICE round-4).
    # Default OFF — on-chip A/B (round 4): the per-pair lax.cond + scalar
    # max-reduce breaks Mosaic's loop pipelining and costs far more than the
    # skipped clusters return (worst probe 17.8 -> 10.4M, seeded 34.3 -> 15.4M)
    pair = os.environ.get("TPUPT_TRI_PAIR", "1") == "1"
    gate = (
        cqx and not hbm and sort and pair
        and os.environ.get("TPUPT_TRI_GATE", "0") == "1"
    )
    if cqx:
        scq, scn, skq = _cluster_queue(
            tri_cl, *planes[:6], planes[6], jnp.float32(tmin), sort,
            sd.tri_cl.shape[0] - 1, want_key=gate,
        )
    else:
        scq, scn = _supercull_order(
            sd.tri_scl, *planes[:6], planes[6], jnp.float32(tmin), sort
        )
        skq = None
    if skq is None:
        skq = jnp.zeros((scq.shape[0], 1), jnp.float32)  # unused without gate
    if os.environ.get("TPUPT_TRI_STUB", "") == "1":
        scn = jnp.zeros_like(scn)  # probe-only: per-row preamble+output cost

    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scq_spec = pl.BlockSpec(
        (SUBLANES, scq.shape[1]), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    kq_spec = pl.BlockSpec(
        (SUBLANES, skq.shape[1]), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    scn_spec = pl.BlockSpec((SUBLANES, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    grid = (bp // BLOCK,)
    f32_out = jax.ShapeDtypeStruct((bp // LANES, LANES), jnp.float32)
    i32_out = jax.ShapeDtypeStruct((bp // LANES, LANES), jnp.int32)

    if hbm:
        n_slots = int(os.environ.get("TPUPT_HBM_SLOTS", "2"))
        kernel = partial(
            _tri_cluster_kernel_hbm, n_cl_blocks=n_cl_blocks,
            pad_cluster=sd.tri_cl.shape[0] - 1,
            nop3=os.environ.get("TPUPT_TRI_NOP3", "") == "1",
            sc_blocks=sd.tri_sc_size // 8, n_slots=n_slots, cqx=cqx,
        )
        pk_spec = pl.BlockSpec(memory_space=pltpu.ANY)  # stays in HBM
        scratch = [
            pltpu.VMEM((max(8, n_cl_blocks), LANES), jnp.int32),  # packed cull words
            pltpu.SMEM((max(64, n_cl_blocks * 8 + 8),), jnp.int32),  # cluster queue
            pltpu.VMEM((16 * n_slots, LANES), jnp.float32),  # slots x (pk 8 + pk2 8)
            pltpu.SemaphoreType.DMA((n_slots, 2)),  # [slot, pk/pk2]
        ]
    else:
        kernel = partial(
            _tri_cluster_kernel, n_cl_blocks=n_cl_blocks,
            pad_cluster=sd.tri_cl.shape[0] - 1, recull=recull,
            pair=pair, cqx=cqx, gate=gate, sc_blocks=sd.tri_sc_size // 8,
        )
        pk_spec = full_spec
        scratch = [
            pltpu.VMEM((max(8, n_cl_blocks), LANES), jnp.int32),  # packed cull words
            pltpu.SMEM((max(64, n_cl_blocks * 8 + 8),), jnp.int32),  # cluster queue
        ]

    t2, id2, nx, ny, nz, uu, vv, mat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            scq_spec,  # per-row (super)cluster queue (phase 0, from XLA)
            scn_spec,  # per-row queue entry count
            kq_spec,  # per-row sorted entry keys (ordered-traversal gate)
            full_spec,  # cluster AABBs
            pk_spec,  # packed triangle geometry blocks
            pk_spec,  # packed shading attribute blocks
            *([ray_spec] * 7),
        ],
        out_specs=[ray_spec] * 8,
        out_shape=[f32_out, i32_out, f32_out, f32_out, f32_out, f32_out, f32_out, i32_out],
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(tmin, jnp.float32).reshape(1), scq, scn, skq, tri_cl, sd.tri_pk,
      sd.tri_pk2, *planes)

    def unplane(x):
        return x.reshape(-1)[:b]

    aux = dict(
        ns_raw=jnp.stack([unplane(nx), unplane(ny), unplane(nz)], axis=-1),
        u=unplane(uu),
        v=unplane(vv),
        mat=unplane(mat),
    )
    return unplane(t2), unplane(id2), aux

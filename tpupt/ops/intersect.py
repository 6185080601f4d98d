"""Ray-scene intersection over SoA geometry tables — TPU-layout-native.

TPU re-design of the reference's per-object virtual `intersects` + BVH recursion
(hittable/*.rs). Layout rules that drive this module (measured ~6x on v5e):

- the RAY BATCH axis [B] stays the minor (128-lane) axis of every intermediate —
  math runs per vector component on [B] or [BLK, B] arrays, never on [B, 3] or
  [B, N] (a trailing dim of 3 or ~20 pads the vector lanes to 128 and wastes them);
- primitives are processed in *prim-major* blocks: a [BLK] slice of the table
  broadcast as [BLK, 1] against rays [1, B], reduced over the BLK sublane axis;
  small tables unroll fully (static Python loop), large ones run a fori_loop over
  dynamic slices;
- winner-attribute fetch uses one-hot matmuls on the MXU for small tables and
  jnp.take for large ones (ops/gather.py).

Intersection math matches the reference exactly:
  sphere  sphere.rs:64-100  (geometric construction, moving center lerped by time)
  quad    quad.rs:40-70     (plane + bilinear alpha/beta in [0,1])
  triangle mesh.rs:50-112   (Moller-Trumbore, interpolated normals/UVs)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..core import linalg as la
from ..scene import data as D
from .gather import take_rows
from .texture import eval_texture
from ..core.dtypes import REAL

BIG = la.BIG

# kinds for the best-hit record
KIND_SPHERE = D.GEOM_SPHERE
KIND_QUAD = D.GEOM_QUAD
KIND_TRI = D.GEOM_TRI

_UNROLL_BLK = 8  # block height for unrolled (small-table) sweeps
_UNROLL_MAX = 64  # tables up to this many rows unroll as static Python loops
_LOOP_BLK = 256  # block height for fori_loop (large-table) sweeps


@dataclasses.dataclass(frozen=True)
class Hit:
    """SoA hit record (reference HitInfo, hit_info.rs:4-13)."""

    valid: jnp.ndarray  # [B] bool
    t: jnp.ndarray  # [B]
    point: jnp.ndarray  # [B,3]
    ng: jnp.ndarray  # [B,3] geometric normal, unit, front-face flipped
    ns: jnp.ndarray  # [B,3] shading normal (normal-mapped where material has one)
    front: jnp.ndarray  # [B] bool
    u: jnp.ndarray  # [B]
    v: jnp.ndarray  # [B]
    mat_id: jnp.ndarray  # [B] int32


jax.tree_util.register_pytree_node(
    Hit,
    lambda h: ((h.valid, h.t, h.point, h.ng, h.ns, h.front, h.u, h.v, h.mat_id), None),
    lambda _, xs: Hit(*xs),
)


def _cols(m):
    """[N,3] -> three [N] column arrays (static slices)."""
    return m[:, 0], m[:, 1], m[:, 2]


def _blk(c, i, blk):
    """Static block i of a column -> [blk, 1] for prim-major broadcasting."""
    return lax.dynamic_slice_in_dim(c, i * blk, blk)[:, None] if not isinstance(i, int) else (
        c[i * blk : (i + 1) * blk][:, None]
    )


def _reduce_best(t_blk, base):
    """[BLK, B] distances -> (best_t [B], best_idx [B]) with idx offset by base."""
    am = jnp.argmin(t_blk, axis=0)
    best = jnp.min(t_blk, axis=0)
    return best, (base + am).astype(jnp.int32)


def _combine(a, b):
    (ta, ia), (tb, ib) = a, b
    better = tb < ta
    return jnp.where(better, tb, ta), jnp.where(better, ib, ia)


def _sweep(n, blk_fn, blk, unroll):
    """Best-hit over ceil(n/blk) prim-major blocks.

    blk_fn(i) -> [blk, B] distances for block i (i is a Python int when unrolled,
    a traced scalar inside fori_loop otherwise).
    """
    n_blocks = (n + blk - 1) // blk
    if unroll:
        best = _reduce_best(blk_fn(0), 0)
        for i in range(1, n_blocks):
            best = _combine(best, _reduce_best(blk_fn(i), i * blk))
        return best

    def body(i, carry):
        return _combine(carry, _reduce_best(blk_fn(i), i * blk))

    b = blk_fn(0).shape[1]
    init = (jnp.full((b,), BIG), jnp.zeros((b,), jnp.int32))
    return lax.fori_loop(0, n_blocks, body, init)


# ---------------------------------------------------------------------------
# per-kind prim-major distance blocks
# ---------------------------------------------------------------------------


def _sphere_block(sd, i, blk, ox, oy, oz, dx, dy, dz, time, tmin, tmax):
    """sphere.rs:64-87 for table block i -> [blk, B]."""
    c1x, c1y, c1z = (_blk(c, i, blk) for c in _cols(sd.sph_c1))
    c2x, c2y, c2z = (_blk(c, i, blk) for c in _cols(sd.sph_c2))
    r = _blk(sd.sph_r, i, blk)
    cx = c1x + (c2x - c1x) * time
    cy = c1y + (c2y - c1y) * time
    cz = c1z + (c2z - c1z) * time
    lx, ly, lz = cx - ox, cy - oy, cz - oz
    s = lx * dx + ly * dy + lz * dz
    l2 = lx * lx + ly * ly + lz * lz
    r2 = r * r
    d2 = l2 - s * s
    q = jnp.sqrt(jnp.maximum(r2 - d2, 1e-20))  # floor: grad-safe (render/diff.py)
    t = jnp.where(l2 > r2, s - q, s + q)
    miss = ((s < 0.0) & (l2 > r2)) | (d2 > r2) | (t <= tmin) | (t >= tmax) | (r < 0.0)
    return jnp.where(miss, BIG, t)


def _quad_block(sd, i, blk, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """quad.rs:40-59 for table block i -> [blk, B]."""
    nx, ny, nz = (_blk(c, i, blk) for c in _cols(sd.quad_n))
    qx, qy, qz = (_blk(c, i, blk) for c in _cols(sd.quad_q))
    ux, uy, uz = (_blk(c, i, blk) for c in _cols(sd.quad_u))
    vx, vy, vz = (_blk(c, i, blk) for c in _cols(sd.quad_v))
    wx, wy, wz = (_blk(c, i, blk) for c in _cols(sd.quad_w))
    dd = _blk(sd.quad_d, i, blk)
    nd = nx * dx + ny * dy + nz * dz
    no = nx * ox + ny * oy + nz * oz
    t = (dd - no) / jnp.where(jnp.abs(nd) < 1e-8, 1.0, nd)
    px = ox + t * dx - qx
    py = oy + t * dy - qy
    pz = oz + t * dz - qz
    # alpha = w . (p x v), beta = w . (u x p)
    alpha = wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz) + wz * (px * vy - py * vx)
    beta = wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz) + wz * (ux * py - uy * px)
    miss = (
        (jnp.abs(nd) < 1e-8)
        | (t <= tmin)
        | (t >= tmax)
        | (alpha < 0.0)
        | (alpha > 1.0)
        | (beta < 0.0)
        | (beta > 1.0)
    )
    return jnp.where(miss, BIG, t)


def _tri_block_mxu(sd, i, blk, phi, tmin, tmax):
    """Möller–Trumbore as matmuls on the MXU for table block i -> [blk, B].

    The four MT determinants are linear functionals of the ray feature vector
    phi = [d, o, o×d, 1] (10 components): a = d·(e2×e1), u·a = (o×d)·e2 − d·(e2×v0),
    v·a = −(o×d)·e1 − d·(v0×e1), t·a = o·n − v0·n. With per-triangle coefficient
    rows precompiled (scene/compile.py: tri_ca/cu/cv/ct [N,10]), a block of
    triangles against the whole ray batch is four [blk,10] @ [10,B] matmuls —
    systolic-array work instead of VPU elementwise, ~10-80x the FLOP rate.
    Epilogue and miss tests are identical to _tri_block (mesh.rs:50-82).
    """
    hp = jax.lax.Precision.HIGHEST  # geometry needs f32-grade accumulation
    ca = lax.dynamic_slice_in_dim(sd.tri_ca, i * blk, blk)
    cu = lax.dynamic_slice_in_dim(sd.tri_cu, i * blk, blk)
    cv = lax.dynamic_slice_in_dim(sd.tri_cv, i * blk, blk)
    ct = lax.dynamic_slice_in_dim(sd.tri_ct, i * blk, blk)
    a = jnp.matmul(ca, phi, precision=hp)  # [blk, B]
    U = jnp.matmul(cu, phi, precision=hp)
    V = jnp.matmul(cv, phi, precision=hp)
    T = jnp.matmul(ct, phi, precision=hp)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
    u = f * U
    v = f * V
    t = f * T
    miss = (
        (jnp.abs(a) < 1e-8)
        | (u < 0.0)
        | (u > 1.0)
        | (v < 0.0)
        | (u + v > 1.0)
        | (t <= tmin)
        | (t >= tmax)
    )
    return jnp.where(miss, BIG, t)


def ray_features(ox, oy, oz, dx, dy, dz):
    """phi [10, B] for the MXU intersection path: [d, o, o×d, 1]."""
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    return jnp.stack([dx, dy, dz, ox, oy, oz, mx, my, mz, jnp.ones_like(ox)], axis=0)


def _tri_block(sd, i, blk, ox, oy, oz, dx, dy, dz, tmin, tmax):
    """mesh.rs:50-82 (Moller-Trumbore) for table block i -> [blk, B]."""
    v0x, v0y, v0z = (_blk(c, i, blk) for c in _cols(sd.tri_v0))
    e1x, e1y, e1z = (_blk(c, i, blk) for c in _cols(sd.tri_e1))
    e2x, e2y, e2z = (_blk(c, i, blk) for c in _cols(sd.tri_e2))
    # h = d x e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    miss = (
        (jnp.abs(a) < 1e-8)
        | (u < 0.0)
        | (u > 1.0)
        | (v < 0.0)
        | (u + v > 1.0)
        | (t <= tmin)
        | (t >= tmax)
    )
    return jnp.where(miss, BIG, t)


# ---------------------------------------------------------------------------
# closest hit
# ---------------------------------------------------------------------------


def closest_hit(sd: "D.SceneData", o, d, time, tmin, tmax, alive=None) -> Hit:
    """Closest hit across all geometry (World::intersect_all, world.rs:47-62).

    Light geometry rows sit after object rows (scene/compile.py), so strict-min
    selection reproduces the reference's tie-break (objects win).

    alive (optional [B] bool): lanes marked dead get a zero best-t seed in the
    cluster kernel, so their stale rays stop inflating packet-row cluster unions
    (their hit record is garbage either way — callers mask by alive).
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    ns, nq, nt = sd.n_spheres, sd.n_quads, sd.n_tris

    def sweep_kind(n, fn):
        # the scene compiler pads tables to a multiple of 8 (<=64 rows) or 256
        if n <= _UNROLL_MAX:
            blk = min(_UNROLL_BLK, n)
            return _sweep(n, lambda i: fn(i, blk), blk, unroll=True)
        return _sweep(n, lambda i: fn(i, _LOOP_BLK), _LOOP_BLK, unroll=False)

    if sd.use_pallas_hit:
        # fused Pallas kernel for the sphere+quad legs (ops/pallas_hit.py):
        # tables in SMEM, rays tiled (8,128), one pass instead of two sweeps
        from .pallas_hit import pallas_closest_sphere_quad

        t_sq, kind_sq, idx_sq = pallas_closest_sphere_quad(
            sd, o, d, time, tmin=tmin, interpret=jax.default_backend() != "tpu"
        )
        t_s = jnp.where(kind_sq == KIND_SPHERE, t_sq, BIG)
        i_s = jnp.where(kind_sq == KIND_SPHERE, idx_sq, 0)
        t_q = jnp.where(kind_sq == KIND_QUAD, t_sq, BIG)
        i_q = jnp.where(kind_sq == KIND_QUAD, idx_sq, 0)
    else:
        t_s, i_s = sweep_kind(
            ns, lambda i, blk: _sphere_block(sd, i, blk, ox, oy, oz, dx, dy, dz, time, tmin, tmax)
        )
        t_q, i_q = sweep_kind(
            nq, lambda i, blk: _quad_block(sd, i, blk, ox, oy, oz, dx, dy, dz, tmin, tmax)
        )
    tri_aux = None
    if sd.has_tri_clusters or sd.has_tri_clusters_hbm:
        # TPU path: SAH cluster packet kernel (ops/pallas_tri.py), seeded with
        # the sphere/quad winner so closer geometry culls cluster visits free;
        # the kernel also returns the winner's interpolated shading attributes
        # so no gather over the big triangle tables happens below. Tables live
        # in VMEM when they fit (has_tri_clusters) and in HBM with DMA staging
        # beyond the ~128k-tri VMEM budget (has_tri_clusters_hbm).
        from .pallas_tri import pallas_closest_tri

        t_in = jnp.minimum(jnp.minimum(t_s, t_q), tmax)
        if alive is not None:
            t_in = jnp.where(alive, t_in, 0.0)  # dead lanes cull every cluster
        t_t, i_t, tri_aux = pallas_closest_tri(
            sd, o, d, t_in, tmin, interpret=jax.default_backend() != "tpu"
        )
    elif sd.has_tri_bvh:
        # large triangle tables traverse the stackless BVH (ops/bvh.py) instead of
        # the dense sweep: O(log n) node visits per lane vs O(n) triangle tests
        from .bvh import bvh_closest_tri

        t_t, i_t = bvh_closest_tri(sd, ox, oy, oz, dx, dy, dz, tmin, tmax)
    elif sd.has_tri_mxu:
        phi = ray_features(ox, oy, oz, dx, dy, dz)
        t_t, i_t = sweep_kind(nt, lambda i, blk: _tri_block_mxu(sd, i, blk, phi, tmin, tmax))
    else:
        t_t, i_t = sweep_kind(
            nt, lambda i, blk: _tri_block(sd, i, blk, ox, oy, oz, dx, dy, dz, tmin, tmax)
        )

    # min across kinds; ties resolve sphere < quad < tri like the old stacked argmin
    t_best = jnp.minimum(jnp.minimum(t_s, t_q), t_t)
    kind = jnp.where(
        t_s == t_best,
        KIND_SPHERE,
        jnp.where(t_q == t_best, KIND_QUAD, KIND_TRI),
    ).astype(jnp.int32)
    idx = jnp.where(
        kind == KIND_SPHERE, i_s, jnp.where(kind == KIND_QUAD, i_q, i_t)
    )
    valid = t_best < BIG
    return _make_hit(sd, o, d, time, t_best, kind, idx, valid, tri_aux=tri_aux)


def _make_hit(sd, o, d, time, t, kind, idx, valid, tri_aux=None) -> Hit:
    """Reconstruct hit attributes at the winning primitive (HitInfo::new).

    Miss lanes come in with t = BIG (3e38); computing attributes there overflows to
    inf and mints NaNs that, although masked in the forward pass, poison reverse-mode
    AD (0-cotangent * NaN, render/diff.py). Clamp t to 0 on invalid lanes — every
    downstream consumer already masks by `valid`.
    """
    t = jnp.where(valid, t, 0.0)
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz

    # ---- sphere attributes (sphere.rs:52-56, 88-90) ----
    si = jnp.where(kind == KIND_SPHERE, idx, 0)
    sph_rows = take_rows(
        jnp.concatenate([sd.sph_c1, sd.sph_c2, sd.sph_r[:, None], sd.sph_mat[:, None].astype(REAL)], axis=1),
        si,
    )
    c1x, c1y, c1z, c2x, c2y, c2z = (sph_rows[..., j] for j in range(6))
    mat_sph = sph_rows[..., 7].astype(jnp.int32)
    cx = c1x + (c2x - c1x) * time
    cy = c1y + (c2y - c1y) * time
    cz = c1z + (c2z - c1z) * time
    nsx, nsy, nsz = px - cx, py - cy, pz - cz
    inv = 1.0 / jnp.sqrt(jnp.maximum(nsx * nsx + nsy * nsy + nsz * nsz, 1e-24))
    nsx, nsy, nsz = nsx * inv, nsy * inv, nsz * inv
    theta = jnp.arccos(jnp.clip(-nsy, -1.0, 1.0))
    phi = jnp.arctan2(-nsz, nsx) + jnp.pi
    u_sph = phi / (2.0 * jnp.pi)
    v_sph = theta / jnp.pi

    # ---- quad attributes (quad.rs:53-69) ----
    qi = jnp.where(kind == KIND_QUAD, idx, 0)
    quad_rows = take_rows(
        jnp.concatenate(
            [sd.quad_q, sd.quad_u, sd.quad_v, sd.quad_w, sd.quad_n,
             sd.quad_mat[:, None].astype(REAL)],
            axis=1,
        ),
        qi,
    )
    qqx, qqy, qqz = (quad_rows[..., j] for j in range(3))
    qux, quy, quz = (quad_rows[..., 3 + j] for j in range(3))
    qvx, qvy, qvz = (quad_rows[..., 6 + j] for j in range(3))
    qwx, qwy, qwz = (quad_rows[..., 9 + j] for j in range(3))
    qnx, qny, qnz = (quad_rows[..., 12 + j] for j in range(3))
    mat_quad = quad_rows[..., 15].astype(jnp.int32)
    prx, pry, prz = px - qqx, py - qqy, pz - qqz
    alpha = qwx * (pry * qvz - prz * qvy) + qwy * (prz * qvx - prx * qvz) + qwz * (prx * qvy - pry * qvx)
    beta = qwx * (quy * prz - quz * pry) + qwy * (quz * prx - qux * prz) + qwz * (qux * pry - quy * prx)

    # ---- triangle attributes (mesh.rs:84-101) ----
    if tri_aux is not None:
        # the cluster kernel already interpolated the winner's attributes
        # in VMEM (ops/pallas_tri.py) — no gather over the [T,*] tables
        ntx, nty, ntz = tri_aux["ns_raw"][..., 0], tri_aux["ns_raw"][..., 1], tri_aux["ns_raw"][..., 2]
        invt = 1.0 / jnp.sqrt(jnp.maximum(ntx * ntx + nty * nty + ntz * ntz, 1e-24))
        ntx, nty, ntz = ntx * invt, nty * invt, ntz * invt
        u_tri, v_tri = tri_aux["u"], tri_aux["v"]
        mat_tri = tri_aux["mat"]
        return _select_hit(
            sd, t, kind, idx, valid, ox, oy, oz, dx, dy, dz, px, py, pz, time,
            nsx, nsy, nsz, u_sph, v_sph, mat_sph,
            qnx, qny, qnz, alpha, beta, mat_quad,
            ntx, nty, ntz, u_tri, v_tri, mat_tri,
        )
    ti = jnp.where(kind == KIND_TRI, idx, 0)
    tri_geo = take_rows(jnp.concatenate([sd.tri_v0, sd.tri_e1, sd.tri_e2], axis=1), ti)
    v0x, v0y, v0z = (tri_geo[..., j] for j in range(3))
    e1x, e1y, e1z = (tri_geo[..., 3 + j] for j in range(3))
    e2x, e2y, e2z = (tri_geo[..., 6 + j] for j in range(3))
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1.0, a)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    bu = f * (sx * hx + sy * hy + sz * hz)
    qx2 = sy * e1z - sz * e1y
    qy2 = sz * e1x - sx * e1z
    qz2 = sx * e1y - sy * e1x
    bv = f * (dx * qx2 + dy * qy2 + dz * qz2)
    bw = 1.0 - bu - bv
    tri_attr = take_rows(
        jnp.concatenate(
            [sd.tri_n0, sd.tri_n1, sd.tri_n2, sd.tri_uv0, sd.tri_uv1, sd.tri_uv2,
             sd.tri_has_uv[:, None].astype(REAL),
             sd.tri_mat[:, None].astype(REAL)],
            axis=1,
        ),
        ti,
    )
    n0x, n0y, n0z = (tri_attr[..., j] for j in range(3))
    n1x, n1y, n1z = (tri_attr[..., 3 + j] for j in range(3))
    n2x, n2y, n2z = (tri_attr[..., 6 + j] for j in range(3))
    uv0u, uv0v = tri_attr[..., 9], tri_attr[..., 10]
    uv1u, uv1v = tri_attr[..., 11], tri_attr[..., 12]
    uv2u, uv2v = tri_attr[..., 13], tri_attr[..., 14]
    has_uv = tri_attr[..., 15] > 0.5
    mat_tri = tri_attr[..., 16].astype(jnp.int32)
    ntx = n0x * bw + n1x * bu + n2x * bv
    nty = n0y * bw + n1y * bu + n2y * bv
    ntz = n0z * bw + n1z * bu + n2z * bv
    invt = 1.0 / jnp.sqrt(jnp.maximum(ntx * ntx + nty * nty + ntz * ntz, 1e-24))
    ntx, nty, ntz = ntx * invt, nty * invt, ntz * invt
    u_tri = jnp.where(has_uv, uv0u * bw + uv1u * bu + uv2u * bv, bu)
    v_tri = jnp.where(has_uv, uv0v * bw + uv1v * bu + uv2v * bv, bv)

    return _select_hit(
        sd, t, kind, idx, valid, ox, oy, oz, dx, dy, dz, px, py, pz, time,
        nsx, nsy, nsz, u_sph, v_sph, mat_sph,
        qnx, qny, qnz, alpha, beta, mat_quad,
        ntx, nty, ntz, u_tri, v_tri, mat_tri,
    )


def _select_hit(
    sd, t, kind, idx, valid, ox, oy, oz, dx, dy, dz, px, py, pz, time,
    nsx, nsy, nsz, u_sph, v_sph, mat_sph,
    qnx, qny, qnz, alpha, beta, mat_quad,
    ntx, nty, ntz, u_tri, v_tri, mat_tri,
) -> Hit:
    """Kind-select the winner's attributes + HitInfo::new epilogue
    (front-face flip and normal mapping, hit_info.rs:25-43)."""
    # ---- select by kind ----
    is_s = kind == KIND_SPHERE
    is_q = kind == KIND_QUAD
    nrx = jnp.where(is_s, nsx, jnp.where(is_q, qnx, ntx))
    nry = jnp.where(is_s, nsy, jnp.where(is_q, qny, nty))
    nrz = jnp.where(is_s, nsz, jnp.where(is_q, qnz, ntz))
    uu = jnp.where(is_s, u_sph, jnp.where(is_q, alpha, u_tri))
    vv = jnp.where(is_s, v_sph, jnp.where(is_q, beta, v_tri))
    mat_id = jnp.where(is_s, mat_sph, jnp.where(is_q, mat_quad, mat_tri))

    # ---- HitInfo::new (hit_info.rs:25-43): front-face flip + normal mapping ----
    front = dx * nrx + dy * nry + dz * nrz < 0.0
    invn = 1.0 / jnp.sqrt(jnp.maximum(nrx * nrx + nry * nry + nrz * nrz, 1e-24))
    sign = jnp.where(front, invn, -invn)
    ngx, ngy, ngz = nrx * sign, nry * sign, nrz * sign

    point = jnp.stack([px, py, pz], axis=-1)
    ng = jnp.stack([ngx, ngy, ngz], axis=-1)

    if sd.has_normal_maps:  # static: scenes without normal maps compile this out
        ntex = sd.mat_normal_tex[mat_id]
        has_nm = ntex >= 0
        mapped = 2.0 * eval_texture(sd, ntex, uu, vv, point) - 1.0
        # ad-hoc tangent basis (hit_info.rs:58-67)
        use_y = jnp.abs(ngx) > 0.9
        axx = jnp.where(use_y, 0.0, 1.0)
        axy = jnp.where(use_y, 1.0, 0.0)
        # tangent = normalize(ng x axis); axis z component is 0
        tx = ngy * 0.0 - ngz * axy
        ty = ngz * axx - ngx * 0.0
        tz = ngx * axy - ngy * axx
        invtg = 1.0 / jnp.sqrt(jnp.maximum(tx * tx + ty * ty + tz * tz, 1e-24))
        tx, ty, tz = tx * invtg, ty * invtg, tz * invtg
        bx = ngy * tz - ngz * ty
        by = ngz * tx - ngx * tz
        bz = ngx * ty - ngy * tx
        mx, my, mz = mapped[..., 0], mapped[..., 1], mapped[..., 2]
        nsx2 = mx * tx + my * bx + mz * ngx
        nsy2 = mx * ty + my * by + mz * ngy
        nsz2 = mx * tz + my * bz + mz * ngz
        invm = 1.0 / jnp.sqrt(jnp.maximum(nsx2 * nsx2 + nsy2 * nsy2 + nsz2 * nsz2, 1e-24))
        ns_mapped = jnp.stack([nsx2 * invm, nsy2 * invm, nsz2 * invm], axis=-1)
        ns_arr = jnp.where(has_nm[..., None], ns_mapped, ng)
    else:
        ns_arr = ng  # scene has no normal maps: shading normal == geometric

    return Hit(
        valid=valid,
        t=t,
        point=point,
        ng=ng,
        ns=ns_arr,
        front=front,
        u=uu,
        v=vv,
        mat_id=mat_id,
    )

"""Ray-scene intersection over SoA geometry tables.

TPU re-design of the reference's per-object virtual `intersects` + BVH recursion
(hittable/*.rs): every ray tests primitives as wide vector ops with a masked min-reduce.
Small tables (reference scenes: <= ~500 spheres, ~20 quads) evaluate as one [B, N]
batch; large triangle tables run a fori_loop over fixed-size blocks carrying the
running best (shape-static, XLA-fusable). An LBVH front-end replaces the brute-force
sweep for large scenes (ops/bvh.py, SURVEY.md section 7 stage 6).

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
from .texture import eval_texture

BIG = la.BIG

# kinds for the best-hit record
KIND_SPHERE = D.GEOM_SPHERE
KIND_QUAD = D.GEOM_QUAD
KIND_TRI = D.GEOM_TRI

_FULL_SWEEP_MAX = 2048  # tables at most this long are tested in one [B, N] batch
_BLOCK = 2048


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


# ---------------------------------------------------------------------------
# per-kind distance kernels: rays [B,3] x prims [N,...] -> t [B,N] (BIG on miss)
# ---------------------------------------------------------------------------


def sphere_ts(o, d, time, c1, c2, r, tmin, tmax):
    """sphere.rs:64-87 for a [B] ray batch against [N] spheres -> [B,N]."""
    center = c1[None, :, :] + (c2 - c1)[None, :, :] * time[:, None, None]
    l = center - o[:, None, :]
    s = jnp.sum(l * d[:, None, :], axis=-1)
    l2 = jnp.sum(l * l, axis=-1)
    r2 = (r * r)[None, :]
    d2 = l2 - s * s
    q = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    t = jnp.where(l2 > r2, s - q, s + q)
    # r < 0 is the compiler's pad sentinel (real spheres clamp radius to >= 0,
    # sphere.rs:26); it must never hit
    miss = (
        ((s < 0.0) & (l2 > r2)) | (d2 > r2) | (t <= tmin) | (t >= tmax) | (r[None, :] < 0.0)
    )
    return jnp.where(miss, BIG, t)


def quad_ts(o, d, q, u, v, w, n, dd, tmin, tmax):
    """quad.rs:40-59 -> [B,N]. Also returns nothing else; alpha/beta re-derived later."""
    nd = jnp.sum(n[None, :, :] * d[:, None, :], axis=-1)
    no = jnp.sum(n[None, :, :] * o[:, None, :], axis=-1)
    safe_nd = jnp.where(jnp.abs(nd) < 1e-8, 1.0, nd)
    t = (dd[None, :] - no) / safe_nd
    p = o[:, None, :] + t[..., None] * d[:, None, :] - q[None, :, :]
    alpha = jnp.sum(w[None, :, :] * jnp.cross(p, jnp.broadcast_to(v[None], p.shape)), axis=-1)
    beta = jnp.sum(w[None, :, :] * jnp.cross(jnp.broadcast_to(u[None], p.shape), p), axis=-1)
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


def tri_ts(o, d, v0, e1, e2, tmin, tmax):
    """mesh.rs:50-82 (Moller-Trumbore) -> [B,N]."""
    h = jnp.cross(d[:, None, :], jnp.broadcast_to(e2[None], (d.shape[0],) + e2.shape))
    a = jnp.sum(e1[None, :, :] * h, axis=-1)
    safe_a = jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
    f = 1.0 / safe_a
    s = o[:, None, :] - v0[None, :, :]
    uu = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, jnp.broadcast_to(e1[None], s.shape))
    vv = f * jnp.sum(d[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[None, :, :] * q, axis=-1)
    miss = (
        (jnp.abs(a) < 1e-8)
        | (uu < 0.0)
        | (uu > 1.0)
        | (vv < 0.0)
        | (uu + vv > 1.0)
        | (t <= tmin)
        | (t >= tmax)
    )
    return jnp.where(miss, BIG, t)


# ---------------------------------------------------------------------------
# best-hit reduction (full sweep or blocked loop)
# ---------------------------------------------------------------------------


def _best_of(ts):
    """[B,N] -> (t_best [B], idx_best [B])."""
    idx = jnp.argmin(ts, axis=-1)
    return jnp.take_along_axis(ts, idx[:, None], axis=-1)[:, 0], idx.astype(jnp.int32)


def _blocked_best(n, make_block_ts):
    """Loop over fixed blocks of a padded table, carrying the running best.

    make_block_ts(start) must return [B, _BLOCK] distances for prims [start, start+_BLOCK).
    `n` must be a multiple of _BLOCK (compiler pads with degenerate prims).
    """
    n_blocks = n // _BLOCK

    def body(i, carry):
        best_t, best_i = carry
        start = i * _BLOCK
        ts = make_block_ts(start)
        t_blk, i_blk = _best_of(ts)
        better = t_blk < best_t
        return jnp.where(better, t_blk, best_t), jnp.where(better, start + i_blk, best_i)

    b = make_block_ts(0).shape[0]
    init = (jnp.full((b,), BIG), jnp.zeros((b,), jnp.int32))
    return lax.fori_loop(1, n_blocks, body, body(0, init)) if n_blocks > 1 else body(0, init)


def closest_hit(sd: "D.SceneData", o, d, time, tmin, tmax) -> Hit:
    """Closest hit across all geometry (World::intersect_all, world.rs:47-62).

    Light geometry rows sit after object rows (scene/compile.py), so strict-min
    selection reproduces the reference's tie-break (objects win).
    """
    ns, nq, nt = sd.n_spheres, sd.n_quads, sd.n_tris

    if ns <= _FULL_SWEEP_MAX:
        t_s, i_s = _best_of(sphere_ts(o, d, time, sd.sph_c1, sd.sph_c2, sd.sph_r, tmin, tmax))
    else:
        t_s, i_s = _blocked_best(
            ns,
            lambda st: sphere_ts(
                o,
                d,
                time,
                lax.dynamic_slice_in_dim(sd.sph_c1, st, _BLOCK),
                lax.dynamic_slice_in_dim(sd.sph_c2, st, _BLOCK),
                lax.dynamic_slice_in_dim(sd.sph_r, st, _BLOCK),
                tmin,
                tmax,
            ),
        )

    t_q, i_q = _best_of(
        quad_ts(o, d, sd.quad_q, sd.quad_u, sd.quad_v, sd.quad_w, sd.quad_n, sd.quad_d, tmin, tmax)
    )

    if nt <= _FULL_SWEEP_MAX:
        t_t, i_t = _best_of(tri_ts(o, d, sd.tri_v0, sd.tri_e1, sd.tri_e2, tmin, tmax))
    else:
        t_t, i_t = _blocked_best(
            nt,
            lambda st: tri_ts(
                o,
                d,
                lax.dynamic_slice_in_dim(sd.tri_v0, st, _BLOCK),
                lax.dynamic_slice_in_dim(sd.tri_e1, st, _BLOCK),
                lax.dynamic_slice_in_dim(sd.tri_e2, st, _BLOCK),
                tmin,
                tmax,
            ),
        )

    ts3 = jnp.stack([t_s, t_q, t_t], axis=-1)
    kind = jnp.argmin(ts3, axis=-1).astype(jnp.int32)
    t_best = jnp.min(ts3, axis=-1)
    idx = jnp.where(kind == KIND_SPHERE, i_s, jnp.where(kind == KIND_QUAD, i_q, i_t))
    valid = t_best < BIG
    return _make_hit(sd, o, d, time, t_best, kind, idx, valid)


def _make_hit(sd, o, d, time, t, kind, idx, valid) -> Hit:
    """Reconstruct hit attributes at the winning primitive (HitInfo::new)."""
    point = o + t[..., None] * d

    # ---- sphere attributes (sphere.rs:52-56, 88-90) ----
    si = jnp.where(kind == KIND_SPHERE, idx, 0)
    c = sd.sph_c1[si] + (sd.sph_c2[si] - sd.sph_c1[si]) * time[..., None]
    n_sph = la.normalize(point - c, eps=1e-30)
    theta = jnp.arccos(jnp.clip(-n_sph[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-n_sph[..., 2], n_sph[..., 0]) + jnp.pi
    uv_sph = jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], axis=-1)
    mat_sph = sd.sph_mat[si]

    # ---- quad attributes (quad.rs:53-69) ----
    qi = jnp.where(kind == KIND_QUAD, idx, 0)
    p_rel = point - sd.quad_q[qi]
    alpha = jnp.sum(sd.quad_w[qi] * jnp.cross(p_rel, sd.quad_v[qi]), axis=-1)
    beta = jnp.sum(sd.quad_w[qi] * jnp.cross(sd.quad_u[qi], p_rel), axis=-1)
    n_quad = sd.quad_n[qi]
    uv_quad = jnp.stack([alpha, beta], axis=-1)
    mat_quad = sd.quad_mat[qi]

    # ---- triangle attributes (mesh.rs:84-101) ----
    ti = jnp.where(kind == KIND_TRI, idx, 0)
    v0, e1, e2 = sd.tri_v0[ti], sd.tri_e1[ti], sd.tri_e2[ti]
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
    s = o - v0
    bu = f * jnp.sum(s * h, axis=-1)
    q2 = jnp.cross(s, e1)
    bv = f * jnp.sum(d * q2, axis=-1)
    bw = 1.0 - bu - bv
    n_tri = la.normalize(
        sd.tri_n0[ti] * bw[..., None] + sd.tri_n1[ti] * bu[..., None] + sd.tri_n2[ti] * bv[..., None],
        eps=1e-30,
    )
    uv_interp = (
        sd.tri_uv0[ti] * bw[..., None] + sd.tri_uv1[ti] * bu[..., None] + sd.tri_uv2[ti] * bv[..., None]
    )
    uv_tri = jnp.where(sd.tri_has_uv[ti][..., None], uv_interp, jnp.stack([bu, bv], axis=-1))
    mat_tri = sd.tri_mat[ti]

    # ---- select by kind ----
    sphere_m = (kind == KIND_SPHERE)[..., None]
    quad_m = (kind == KIND_QUAD)[..., None]
    n_raw = jnp.where(sphere_m, n_sph, jnp.where(quad_m, n_quad, n_tri))
    uv = jnp.where(sphere_m, uv_sph, jnp.where(quad_m, uv_quad, uv_tri))
    mat_id = jnp.where(
        kind == KIND_SPHERE, mat_sph, jnp.where(kind == KIND_QUAD, mat_quad, mat_tri)
    )

    # ---- HitInfo::new (hit_info.rs:25-43): front-face flip + normal mapping ----
    front = jnp.sum(d * n_raw, axis=-1) < 0.0
    ng = la.normalize(n_raw, eps=1e-30) * jnp.where(front, 1.0, -1.0)[..., None]

    ntex = sd.mat_normal_tex[mat_id]
    has_nm = ntex >= 0
    mapped = 2.0 * eval_texture(sd, ntex, uv[..., 0], uv[..., 1], point) - 1.0
    # ad-hoc tangent basis (hit_info.rs:58-67)
    use_y = jnp.abs(ng[..., 0]) > 0.9
    axis = jnp.where(
        use_y[..., None],
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], ng.dtype), ng.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], ng.dtype), ng.shape),
    )
    tangent = la.normalize(jnp.cross(ng, axis), eps=1e-30)
    bitangent = jnp.cross(ng, tangent)
    ns_mapped = la.normalize(
        mapped[..., 0:1] * tangent + mapped[..., 1:2] * bitangent + mapped[..., 2:3] * ng,
        eps=1e-30,
    )
    ns = jnp.where(has_nm[..., None], ns_mapped, ng)

    return Hit(
        valid=valid,
        t=t,
        point=point,
        ng=ng,
        ns=ns,
        front=front,
        u=uv[..., 0],
        v=uv[..., 1],
        mat_id=mat_id,
    )

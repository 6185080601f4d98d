"""Pallas TPU kernel: fused sphere+quad closest-hit over the SoA scene tables.

The Pallas leg of the intersection stage (BASELINE.json north star: hot ops as
Pallas kernels). One kernel walks every sphere (sphere.rs:64-100 math) and quad
(quad.rs:40-70) against a block of rays entirely in VMEM/registers:

- rays arrive as component planes reshaped to [B/128, 128] (f32 tile (8,128): the
  lane axis rides the 128-wide vector lanes, 8 sublane rows per grid step =
  1024 rays per program);
- the scene tables sit in SMEM (a Cornell-sized table is a few hundred scalars)
  and are read as scalars inside a statically unrolled prim loop — no HBM traffic
  per prim, no gather;
- the winner is written as (t, packed code) where code = kind << 24 | prim index.

Triangles are not handled here (mesh scenes use the dense sweep / BVH paths in
ops/intersect.py); the caller combines this kernel's result with the triangle leg.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # plain float: a jnp scalar would be a captured constant in the kernel

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES  # rays per grid step


def _hit_kernel(tmin_ref, sph_ref, quad_ref, ox, oy, oz, dx, dy, dz, tm, t_out, code_out,
                *, n_sph, n_quad):
    tmin = tmin_ref[0]
    best_t = jnp.full((SUBLANES, LANES), BIG, jnp.float32)
    best_c = jnp.zeros((SUBLANES, LANES), jnp.int32)

    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    time = tm[:]

    # ---- spheres (sphere.rs:64-100); rows: c1x c1y c1z c2x c2y c2z r ----
    for i in range(n_sph):
        c1x = sph_ref[0, i]
        c1y = sph_ref[1, i]
        c1z = sph_ref[2, i]
        cx = c1x + (sph_ref[3, i] - c1x) * time
        cy = c1y + (sph_ref[4, i] - c1y) * time
        cz = c1z + (sph_ref[5, i] - c1z) * time
        r = sph_ref[6, i]
        lx, ly, lz = cx - o_x, cy - o_y, cz - o_z
        s = lx * d_x + ly * d_y + lz * d_z
        l2 = lx * lx + ly * ly + lz * lz
        r2 = r * r
        d2 = l2 - s * s
        q = jnp.sqrt(jnp.maximum(r2 - d2, 1e-20))
        t = jnp.where(l2 > r2, s - q, s + q)
        miss = ((s < 0.0) & (l2 > r2)) | (d2 > r2) | (t <= tmin) | (t >= best_t) | (r < 0.0)
        hit = ~miss
        best_c = jnp.where(hit, i, best_c)  # kind sphere = 0 in the high byte
        best_t = jnp.where(hit, t, best_t)

    # ---- quads (quad.rs:40-70); rows: n(3) q(3) u(3) v(3) w(3) d ----
    kind_quad = jnp.int32(1 << 24)
    for i in range(n_quad):
        nx = quad_ref[0, i]
        ny = quad_ref[1, i]
        nz = quad_ref[2, i]
        nd = nx * d_x + ny * d_y + nz * d_z
        no = nx * o_x + ny * o_y + nz * o_z
        parallel = jnp.abs(nd) < 1e-8
        t = (quad_ref[15, i] - no) / jnp.where(parallel, 1.0, nd)
        px = o_x + t * d_x - quad_ref[3, i]
        py = o_y + t * d_y - quad_ref[4, i]
        pz = o_z + t * d_z - quad_ref[5, i]
        ux = quad_ref[6, i]
        uy = quad_ref[7, i]
        uz = quad_ref[8, i]
        vx = quad_ref[9, i]
        vy = quad_ref[10, i]
        vz = quad_ref[11, i]
        wx = quad_ref[12, i]
        wy = quad_ref[13, i]
        wz = quad_ref[14, i]
        alpha = wx * (py * vz - pz * vy) + wy * (pz * vx - px * vz) + wz * (px * vy - py * vx)
        beta = wx * (uy * pz - uz * py) + wy * (uz * px - ux * pz) + wz * (ux * py - uy * px)
        miss = (
            parallel
            | (t <= tmin)
            | (t >= best_t)
            | (alpha < 0.0)
            | (alpha > 1.0)
            | (beta < 0.0)
            | (beta > 1.0)
        )
        hit = ~miss
        best_c = jnp.where(hit, kind_quad | i, best_c)
        best_t = jnp.where(hit, t, best_t)

    t_out[:] = best_t
    code_out[:] = best_c


def _tables(sd):
    """Scene tables as SMEM-friendly [rows, prims] f32 host arrays."""
    sph = jnp.stack(
        [
            sd.sph_c1[:, 0], sd.sph_c1[:, 1], sd.sph_c1[:, 2],
            sd.sph_c2[:, 0], sd.sph_c2[:, 1], sd.sph_c2[:, 2],
            sd.sph_r,
        ],
        axis=0,
    )
    quad = jnp.stack(
        [
            sd.quad_n[:, 0], sd.quad_n[:, 1], sd.quad_n[:, 2],
            sd.quad_q[:, 0], sd.quad_q[:, 1], sd.quad_q[:, 2],
            sd.quad_u[:, 0], sd.quad_u[:, 1], sd.quad_u[:, 2],
            sd.quad_v[:, 0], sd.quad_v[:, 1], sd.quad_v[:, 2],
            sd.quad_w[:, 0], sd.quad_w[:, 1], sd.quad_w[:, 2],
            sd.quad_d,
        ],
        axis=0,
    )
    return sph, quad


def pallas_closest_sphere_quad(sd, o, d, time, tmin=1e-3, interpret=False):
    """Fused sphere+quad closest hit -> (t [B], kind [B] int32, idx [B] int32).

    B is padded internally to a multiple of 1024; misses carry t = BIG.
    tmin defaults to the reference's T_MIN = 1e-3 (camera.rs:171) and is passed
    to the kernel as a scalar operand (not baked into the compiled code).
    """
    b = o.shape[0]
    pad = (-b) % BLOCK
    bp = b + pad

    def plane(x):
        return jnp.pad(x, (0, pad)).reshape(bp // LANES, LANES)

    planes = [
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(time),
    ]
    sph, quad = _tables(sd)
    n_sph = sph.shape[1]
    n_quad = quad.shape[1]

    grid = (bp // BLOCK,)
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_sd = jax.ShapeDtypeStruct((bp // LANES, LANES), jnp.float32)
    out_sc = jax.ShapeDtypeStruct((bp // LANES, LANES), jnp.int32)

    t2, code2 = pl.pallas_call(
        partial(_hit_kernel, n_sph=n_sph, n_quad=n_quad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *([ray_spec] * 7),
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[out_sd, out_sc],
        interpret=interpret,
    )(jnp.asarray(tmin, jnp.float32).reshape(1), sph, quad, *planes)

    t = t2.reshape(-1)[:b]
    code = code2.reshape(-1)[:b]
    return t, code >> 24, code & 0x00FFFFFF

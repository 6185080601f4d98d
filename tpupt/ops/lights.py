"""Light sampling and pdf for NEE / MIS.

Matches the reference estimator exactly (SURVEY.md section 3.5):

- `sample`: pick one light uniformly (list.rs:78-84), sample a point on it
  (quad.rs:80-86 uniform in parallelogram; sphere.rs:110-121 uniform on the *full*
  sphere; mesh.rs:122-129 uniform-uv triangle, reference's bias preserved), return the
  normalized direction from the shading point.
- `pdf`: MEAN over all lights of the per-light pdf (list.rs:86-96), each of which
  re-intersects its own geometry with interval (0, inf):
    quad/tri: dist^2 / (cos_theta * area)                  quad.rs:88-98, mesh.rs:131-141
    sphere:   1 / (2*pi*sqrt(1 - r^2/|c-o|^2))             sphere.rs:123-135
  NOTE the sphere solid angle is the reference's actual formula — `2*PI*(1 - r2/d2).sqrt()`
  — not the standard cone solid angle 2*pi*(1-sqrt(1-r2/d2)).

Visibility is implicit: the sampled direction becomes the next path ray (camera.rs:218);
there is no separate shadow connection.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import linalg as la
from ..scene import data as D

TWO_PI = jnp.float32(2.0 * jnp.pi)


def sample_lights(sd: "D.SceneData", origin, time, u_pick, u1, u2):
    """Pick a light uniformly and sample a direction toward it -> [B,3] unit dirs."""
    n = sd.n_lights
    li = jnp.minimum((u_pick * n).astype(jnp.int32), n - 1)
    kind = sd.light_kind[li]
    gi = sd.light_idx[li]

    # sphere: uniform point on the full sphere (sphere.rs:110-121)
    si = jnp.where(kind == D.GEOM_SPHERE, gi, 0)
    theta = TWO_PI * u1
    phi = jnp.arccos(jnp.clip(2.0 * u2 - 1.0, -1.0, 1.0))
    sp = jnp.sin(phi)
    offset = jnp.stack([sp * jnp.cos(theta), sp * jnp.sin(theta), jnp.cos(phi)], axis=-1)
    c = sd.sph_c1[si] + (sd.sph_c2[si] - sd.sph_c1[si]) * time[..., None]
    p_sph = c + offset * sd.sph_r[si][..., None]

    # quad: uniform in the parallelogram (quad.rs:80-86)
    qi = jnp.where(kind == D.GEOM_QUAD, gi, 0)
    p_quad = sd.quad_q[qi] + sd.quad_u[qi] * u1[..., None] + sd.quad_v[qi] * u2[..., None]

    # triangle: uniform (u,v) without fold — reference bias preserved (mesh.rs:122-129)
    ti = jnp.where(kind == D.GEOM_TRI, gi, 0)
    w = 1.0 - u1 - u2
    p_tri = (
        sd.tri_v0[ti] * w[..., None]
        + (sd.tri_v0[ti] + sd.tri_e1[ti]) * u1[..., None]
        + (sd.tri_v0[ti] + sd.tri_e2[ti]) * u2[..., None]
    )

    point = jnp.where(
        (kind == D.GEOM_SPHERE)[..., None],
        p_sph,
        jnp.where((kind == D.GEOM_QUAD)[..., None], p_quad, p_tri),
    )
    return la.normalize(point - origin, eps=1e-30)


def _sphere_light_pdf(sd, si, origin, direction, time):
    """sphere.rs:123-135 with interval (0, inf)."""
    c = sd.sph_c1[si] + (sd.sph_c2[si] - sd.sph_c1[si]) * time[..., None]
    r = sd.sph_r[si]
    l = c - origin
    s = jnp.sum(l * direction, axis=-1)
    l2 = jnp.sum(l * l, axis=-1)
    r2 = r * r
    d2 = l2 - s * s
    q = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    t = jnp.where(l2 > r2, s - q, s + q)
    hit = ~(((s < 0.0) & (l2 > r2)) | (d2 > r2)) & (t > 0.0)
    solid_angle = TWO_PI * jnp.sqrt(jnp.maximum(1.0 - r2 / jnp.maximum(l2, 1e-20), 0.0))
    return jnp.where(hit, 1.0 / jnp.maximum(solid_angle, 1e-20), 0.0)


def _quad_light_pdf(sd, qi, origin, direction):
    """quad.rs:88-98 with interval (0, inf)."""
    n = sd.quad_n[qi]
    nd = jnp.sum(n * direction, axis=-1)
    no = jnp.sum(n * origin, axis=-1)
    safe_nd = jnp.where(jnp.abs(nd) < 1e-8, 1.0, nd)
    t = (sd.quad_d[qi] - no) / safe_nd
    p = origin + t[..., None] * direction - sd.quad_q[qi]
    alpha = jnp.sum(sd.quad_w[qi] * jnp.cross(p, sd.quad_v[qi]), axis=-1)
    beta = jnp.sum(sd.quad_w[qi] * jnp.cross(sd.quad_u[qi], p), axis=-1)
    hit = (
        (jnp.abs(nd) >= 1e-8)
        & (t > 0.0)
        & (alpha >= 0.0)
        & (alpha <= 1.0)
        & (beta >= 0.0)
        & (beta <= 1.0)
    )
    area = la.length(jnp.cross(sd.quad_u[qi], sd.quad_v[qi]))
    cos_theta = jnp.abs(nd)  # |dir . normal| (quad.rs:93; flip sign cancels in abs)
    pdf = (t * t) / jnp.maximum(cos_theta * area, 1e-20)
    return jnp.where(hit, pdf, 0.0)


def _tri_light_pdf(sd, ti, origin, direction):
    """mesh.rs:131-141 with interval (0, inf)."""
    v0, e1, e2 = sd.tri_v0[ti], sd.tri_e1[ti], sd.tri_e2[ti]
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
    s = origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    hit = (jnp.abs(a) >= 1e-8) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    w = 1.0 - u - v
    normal = la.normalize(
        sd.tri_n0[ti] * w[..., None] + sd.tri_n1[ti] * u[..., None] + sd.tri_n2[ti] * v[..., None],
        eps=1e-30,
    )
    area = 0.5 * la.length(jnp.cross(e1, e2))
    cos_theta = jnp.abs(jnp.sum(direction * normal, axis=-1))
    pdf = (t * t) / jnp.maximum(cos_theta * area, 1e-20)
    return jnp.where(hit, pdf, 0.0)


def pdf_lights(sd: "D.SceneData", origin, direction, time):
    """Mean per-light pdf over the light table (list.rs:86-96) -> [B]."""
    n = sd.n_lights
    total = jnp.zeros(origin.shape[:-1], dtype=jnp.float32)
    # n is a static (compile-time) table length; small in every reference scene.
    for i in range(n):
        kind = sd.light_kind[i]
        gi = sd.light_idx[i]
        si = jnp.where(kind == D.GEOM_SPHERE, gi, 0)
        qi = jnp.where(kind == D.GEOM_QUAD, gi, 0)
        ti = jnp.where(kind == D.GEOM_TRI, gi, 0)
        p_s = _sphere_light_pdf(sd, si, origin, direction, time)
        p_q = _quad_light_pdf(sd, qi, origin, direction)
        p_t = _tri_light_pdf(sd, ti, origin, direction)
        total += jnp.where(
            kind == D.GEOM_SPHERE, p_s, jnp.where(kind == D.GEOM_QUAD, p_q, p_t)
        )
    return total / jnp.float32(n)

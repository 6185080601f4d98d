"""Light sampling and pdf for NEE / MIS — component-form (SoA) implementation.

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
there is no separate shadow connection. The per-light loop is a static Python loop
(reference scenes have 1-2 lights) and all per-lane math is [B]-shaped.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import linalg as la
from ..scene import data as D
from .gather import take_rows
from ..core.dtypes import NP_REAL, REAL

TWO_PI = NP_REAL(2.0 * jnp.pi)


def sample_lights(sd: "D.SceneData", origin, time, u_pick, u1, u2):
    """Pick a light member uniformly and sample a direction toward it -> [B,3].

    Members are the geometry lights (list.rs:78-84) plus, when the scene has an
    HDR environment with importance sampling (sd.env_is_hdr — NEW capability),
    the environment itself as one extra member sampled from its alias table.

    Returns (dir [B,3], is_env [B] bool). is_env marks lanes whose pick was the
    environment member — the integrator kills those when they aim below the
    shading horizon of an opaque (diffuse/metal) lane, because the reference's
    |cos| eval (diffuse.rs:65, metal.rs:78) would otherwise leak non-physical
    transmission energy straight into the env miss path (render/integrator.py).
    """
    if sd.env_is_hdr:
        from .envmap import sample_env_light

        m = sd.n_lights_real + 1
        pick = jnp.minimum((u_pick * m).astype(jnp.int32), m - 1)
        env_dir = sample_env_light(sd, u1, u2)
        if sd.n_lights_real == 0:
            return la.pack3(env_dir), jnp.ones(u_pick.shape, bool)
        is_env = pick == sd.n_lights_real
        geom_dir = la.unpack3(_sample_geom_lights(sd, origin, time, pick, u1, u2))
        return la.pack3(la.where3(is_env, env_dir, geom_dir)), is_env
    dir_ = _sample_geom_lights(
        sd, origin, time, jnp.minimum((u_pick * sd.n_lights).astype(jnp.int32), sd.n_lights - 1),
        u1, u2,
    )
    return dir_, jnp.zeros(u_pick.shape, bool)


def _sample_geom_lights(sd: "D.SceneData", origin, time, li, u1, u2):
    """Sample a direction toward geometry light `li` [B] -> [B,3] unit dirs."""
    li = jnp.minimum(li, sd.n_lights - 1)
    rows = take_rows(sd.light_geom, li)  # [B, 10] kind-uniform rows (scene/compile.py)
    kind = rows[..., 9].astype(jnp.int32)
    ox, oy, oz = la.unpack3(origin)

    ax, ay, az = rows[..., 0], rows[..., 1], rows[..., 2]
    bx, by, bz = rows[..., 3], rows[..., 4], rows[..., 5]
    cx, cy, cz = rows[..., 6], rows[..., 7], rows[..., 8]

    # sphere: uniform point on the full sphere (sphere.rs:110-121)
    theta = TWO_PI * u1
    phi = jnp.arccos(jnp.clip(2.0 * u2 - 1.0, -1.0, 1.0))
    sp = jnp.sin(phi)
    r = cx  # radius slot for spheres
    scx = ax + (bx - ax) * time
    scy = ay + (by - ay) * time
    scz = az + (bz - az) * time
    p_sph = (
        scx + sp * jnp.cos(theta) * r,
        scy + sp * jnp.sin(theta) * r,
        scz + jnp.cos(phi) * r,
    )

    # quad: q + u*u1 + v*u2 (quad.rs:80-86)
    p_quad = (ax + bx * u1 + cx * u2, ay + by * u1 + cy * u2, az + bz * u1 + cz * u2)

    # triangle: v0*w + v1*u1 + v2*u2 with w = 1-u1-u2, no fold (mesh.rs:122-129):
    # = v0 + e1*u1 + e2*u2  (since v1 = v0+e1, v2 = v0+e2 and w+u1+u2 = 1)
    p_tri = (ax + bx * u1 + cx * u2, ay + by * u1 + cy * u2, az + bz * u1 + cz * u2)

    is_s = kind == D.GEOM_SPHERE
    is_q = kind == D.GEOM_QUAD
    p = la.where3(is_s, p_sph, la.where3(is_q, p_quad, p_tri))
    d = la.normalize3((p[0] - ox, p[1] - oy, p[2] - oz), eps=1e-30)
    return la.pack3(d)


def _sphere_light_pdf(c1, c2, r, o, d, time):
    """sphere.rs:123-135 with interval (0, inf). All args component/[B] form."""
    cx = c1[0] + (c2[0] - c1[0]) * time
    cy = c1[1] + (c2[1] - c1[1]) * time
    cz = c1[2] + (c2[2] - c1[2]) * time
    lx, ly, lz = cx - o[0], cy - o[1], cz - o[2]
    s = lx * d[0] + ly * d[1] + lz * d[2]
    l2 = lx * lx + ly * ly + lz * lz
    r2 = r * r
    d2 = l2 - s * s
    q = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
    t = jnp.where(l2 > r2, s - q, s + q)
    hit = ~(((s < 0.0) & (l2 > r2)) | (d2 > r2)) & (t > 0.0)
    solid_angle = TWO_PI * jnp.sqrt(jnp.maximum(1.0 - r2 / jnp.maximum(l2, 1e-20), 0.0))
    return jnp.where(hit, 1.0 / jnp.maximum(solid_angle, 1e-20), 0.0)


def _quad_light_pdf(q, u, v, w, nrm, dd, o, d):
    """quad.rs:88-98 with interval (0, inf)."""
    nd = nrm[0] * d[0] + nrm[1] * d[1] + nrm[2] * d[2]
    no = nrm[0] * o[0] + nrm[1] * o[1] + nrm[2] * o[2]
    t = (dd - no) / jnp.where(jnp.abs(nd) < 1e-8, 1.0, nd)
    px = o[0] + t * d[0] - q[0]
    py = o[1] + t * d[1] - q[1]
    pz = o[2] + t * d[2] - q[2]
    alpha = w[0] * (py * v[2] - pz * v[1]) + w[1] * (pz * v[0] - px * v[2]) + w[2] * (px * v[1] - py * v[0])
    beta = w[0] * (u[1] * pz - u[2] * py) + w[1] * (u[2] * px - u[0] * pz) + w[2] * (u[0] * py - u[1] * px)
    hit = (
        (jnp.abs(nd) >= 1e-8)
        & (t > 0.0)
        & (alpha >= 0.0)
        & (alpha <= 1.0)
        & (beta >= 0.0)
        & (beta <= 1.0)
    )
    ucv = la.cross3(u, v)
    area = jnp.sqrt(la.dot3(ucv, ucv))
    cos_theta = jnp.abs(nd)  # |dir . normal| (quad.rs:93; flip sign cancels in abs)
    pdf = (t * t) / jnp.maximum(cos_theta * area, 1e-20)
    return jnp.where(hit, pdf, 0.0)


def _tri_light_pdf(v0, e1, e2, n0, n1, n2, o, d):
    """mesh.rs:131-141 with interval (0, inf)."""
    h = la.cross3(d, e2)
    a = la.dot3(e1, h)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-8, 1.0, a)
    s = (o[0] - v0[0], o[1] - v0[1], o[2] - v0[2])
    u = f * la.dot3(s, h)
    q = la.cross3(s, e1)
    v = f * la.dot3(d, q)
    t = f * la.dot3(e2, q)
    hit = (jnp.abs(a) >= 1e-8) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    w = 1.0 - u - v
    nrm = la.normalize3(
        (
            n0[0] * w + n1[0] * u + n2[0] * v,
            n0[1] * w + n1[1] * u + n2[1] * v,
            n0[2] * w + n1[2] * u + n2[2] * v,
        ),
        eps=1e-30,
    )
    e1xe2 = la.cross3(e1, e2)
    area = 0.5 * jnp.sqrt(la.dot3(e1xe2, e1xe2))
    cos_theta = jnp.abs(la.dot3(d, nrm))
    pdf = (t * t) / jnp.maximum(cos_theta * area, 1e-20)
    return jnp.where(hit, pdf, 0.0)


def pdf_lights(sd: "D.SceneData", origin, direction, time):
    """Mean per-member pdf (list.rs:86-96), env included when sd.env_is_hdr -> [B]."""
    o = la.unpack3(origin)
    d = la.unpack3(direction)
    if sd.env_is_hdr:
        from .envmap import pdf_env_light

        n_geom = sd.n_lights_real
        total = pdf_env_light(sd, direction)
        if n_geom:
            total = total + _sum_geom_light_pdfs(sd, o, d, time, n_geom)
        return total / REAL(n_geom + 1)
    return _sum_geom_light_pdfs(sd, o, d, time, sd.n_lights) / REAL(sd.n_lights)


def _sum_geom_light_pdfs(sd: "D.SceneData", o, d, time, n):
    total = jnp.zeros_like(o[0])
    # n is a static (compile-time) table length; small in every reference scene.
    # light kinds/indices are numpy-able at trace time (concrete scene arrays) only
    # outside jit; inside jit they are traced, so branch per-kind with where.
    for i in range(n):
        kind = sd.light_kind[i]
        gi = sd.light_idx[i]
        si = jnp.where(kind == D.GEOM_SPHERE, gi, 0)
        qi = jnp.where(kind == D.GEOM_QUAD, gi, 0)
        ti = jnp.where(kind == D.GEOM_TRI, gi, 0)
        p_s = _sphere_light_pdf(
            tuple(sd.sph_c1[si]), tuple(sd.sph_c2[si]), sd.sph_r[si], o, d, time
        )
        p_q = _quad_light_pdf(
            tuple(sd.quad_q[qi]),
            tuple(sd.quad_u[qi]),
            tuple(sd.quad_v[qi]),
            tuple(sd.quad_w[qi]),
            tuple(sd.quad_n[qi]),
            sd.quad_d[qi],
            o,
            d,
        )
        p_t = _tri_light_pdf(
            tuple(sd.tri_v0[ti]),
            tuple(sd.tri_e1[ti]),
            tuple(sd.tri_e2[ti]),
            tuple(sd.tri_n0[ti]),
            tuple(sd.tri_n1[ti]),
            tuple(sd.tri_n2[ti]),
            o,
            d,
        )
        total += jnp.where(
            kind == D.GEOM_SPHERE, p_s, jnp.where(kind == D.GEOM_QUAD, p_q, p_t)
        )
    return total

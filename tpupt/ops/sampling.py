"""Microfacet distributions and samplers (vectorized port targets of bsdf/sampling.rs).

All functions take explicit uniforms (no ambient RNG) and operate on the shading-local
frame where the normal is +z. Reference quirks are reproduced deliberately — they are
part of the estimator we must match (SURVEY.md section 7 decision 5):

- ``ggx.D`` uses alpha^2 = roughness^2 (not Disney's roughness^4) with 0.001 floors
  (sampling.rs:38-43);
- ``gtr1.D`` divides by ``log2(alpha^2)`` where Disney uses ``ln`` (sampling.rs:121-125);
- ``gtr1.sample`` omits the sqrt on cos_theta (sampling.rs:132 vs Disney);
- VNDF sampling is the Heitz stretch construction (sampling.rs:66-94).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import linalg as la

PI = jnp.float32(jnp.pi)


def cosine_sample_hemisphere(u1, u2):
    """sampling.rs:18-24. u1 -> phi, u2 -> r2 (draw order of the reference)."""
    phi = 2.0 * PI * u1
    r2 = u2
    r2s = jnp.sqrt(r2)
    return jnp.stack(
        [r2s * jnp.cos(phi), r2s * jnp.sin(phi), jnp.sqrt(1.0 - r2)], axis=-1
    )


def ggx_D(h, roughness):
    """sampling.rs:38-43."""
    cos_theta = jnp.maximum(h[..., 2], 0.001)
    alpha2 = jnp.maximum(roughness * roughness, 0.001)
    denom = (alpha2 - 1.0) * cos_theta * cos_theta + 1.0
    return alpha2 / (PI * denom * denom)


def ggx_G1(w, roughness):
    """sampling.rs:51-55."""
    alpha2 = jnp.maximum(roughness * roughness, 0.001)
    cos_theta = jnp.abs(w[..., 2])
    return (
        2.0
        * cos_theta
        / (cos_theta + jnp.sqrt(cos_theta * cos_theta * (1.0 - alpha2) + alpha2))
    )


def ggx_G(v, l, roughness):
    """sampling.rs:45-49 (separable Smith)."""
    return ggx_G1(v, roughness) * ggx_G1(l, roughness)


def _sample_ggx_vndf(v, a2, e1, e2):
    """Heitz VNDF sampling with the stretch trick (sampling.rs:66-94)."""
    # stretch view
    vs = la.normalize(
        jnp.stack([v[..., 0] * a2, v[..., 1] * a2, v[..., 2]], axis=-1)
    )
    # orthonormal basis (sampling.rs:71-76)
    z = jnp.zeros_like(vs)
    z = z.at[..., 2].set(1.0)
    t1_generic = la.normalize(la.cross(vs, z), eps=1e-30)
    x_axis = jnp.zeros_like(vs).at[..., 0].set(1.0)
    t1 = jnp.where((vs[..., 2] < 0.9999)[..., None], t1_generic, x_axis)
    t2 = la.cross(t1, vs)
    # sample (sampling.rs:78-91)
    a = 1.0 / (1.0 + vs[..., 2])
    r = jnp.sqrt(e1)
    lo = e2 < a
    phi = jnp.where(lo, e2 / a * PI, PI + (e2 - a) / (1.0 - a) * PI)
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi) * jnp.where(lo, 1.0, vs[..., 2])
    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    n = p1[..., None] * t1 + p2[..., None] * t2 + pz[..., None] * vs
    unstretched = jnp.stack(
        [a2 * n[..., 0], a2 * n[..., 1], jnp.maximum(n[..., 2], 0.0)], axis=-1
    )
    return la.normalize(unstretched, eps=1e-30)


def ggx_sample_microfacet_normal(v, roughness, e1, e2):
    """sampling.rs:57-64: VNDF sample with a2 = roughness^2, flipped to z >= 0."""
    h = _sample_ggx_vndf(v, roughness * roughness, e1, e2)
    return jnp.where((h[..., 2] < 0.0)[..., None], -h, h)


def gtr1_D(abs_cos_theta, alpha_g):
    """sampling.rs:121-125 — note the reference's log2 (Disney uses ln); matched."""
    alpha2 = alpha_g * alpha_g
    t = 1.0 + (alpha2 - 1.0) * abs_cos_theta * abs_cos_theta
    return (alpha2 - 1.0) / (PI * t * jnp.log2(alpha2))


def gtr1_sample_microfacet_normal(alpha, e1, e2):
    """sampling.rs:127-142 — cos_theta without sqrt, as in the reference."""
    alpha2 = alpha * alpha
    cos_theta = (1.0 - jnp.power(alpha2, 1.0 - e1)) / (1.0 - alpha2)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * PI * e2
    h = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return jnp.where((h[..., 2] < 0.0)[..., None], -h, h)


# -- fresnel (bsdf/mod.rs:74-97) --------------------------------------------


def fresnel_dielectric(w, h, eta_i, eta_o):
    """Exact dielectric Fresnel (bsdf/mod.rs:77-88); 1.0 on TIR (g^2 < 0)."""
    c = jnp.abs(la.dot(w, h))
    g_squared = (eta_o / eta_i) ** 2 - 1.0 + c * c
    g = jnp.sqrt(jnp.maximum(g_squared, 0.0))
    gmc = g - c
    gpc = g + c
    x = (c * gpc - 1.0) / (c * gmc + 1.0)
    f = 0.5 * (gmc * gmc) / (gpc * gpc) * (1.0 + x * x)
    return jnp.where(g_squared < 0.0, 1.0, f)


def pow5(x):
    """x^5 via multiplies — matches Rust `powi(5)` for negative bases too."""
    x2 = x * x
    return x2 * x2 * x


def fresnel_schlick(r0, angle):
    """bsdf/mod.rs:90-92 (vector r0; angle may be negative, as in the reference)."""
    return r0 + (1.0 - r0) * pow5(1.0 - angle)[..., None]


def schlick_weight(x):
    """bsdf/mod.rs:94-96."""
    return pow5(jnp.clip(1.0 - x, 0.0, 1.0))


def tint(base_color):
    """c_tint (bsdf/mod.rs:61-68): color / luminance, or 1 when black."""
    lum = la.luminance(base_color)
    safe = jnp.where(lum > 0.0, lum, 1.0)[..., None]
    return jnp.where((lum > 0.0)[..., None], base_color / safe, 1.0)


def r0_from_eta(eta):
    """bsdf/mod.rs:70-72."""
    return ((eta - 1.0) / (eta + 1.0)) ** 2

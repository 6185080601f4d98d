"""Microfacet distributions and samplers (vectorized port targets of bsdf/sampling.rs).

All functions are component-native (3-tuples of [B] arrays, see core/linalg.py SoA
notes) and take explicit uniforms — no ambient RNG. They operate in the shading-local
frame where the normal is +z. Reference quirks are reproduced deliberately — they are
part of the estimator we must match (SURVEY.md section 7 decision 5):

- ``ggx.D`` uses alpha^2 = roughness^2 (not Disney's roughness^4) with 0.001 floors
  (sampling.rs:38-43);
- the VNDF sampler stretches by roughness^2 where D/G1 use alpha = roughness —
  the reference's sample() and pdf() genuinely disagree (sampling.rs:57-68 vs 38-43);
- ``gtr1.D`` divides by ``log2(alpha^2)`` where Disney uses ``ln`` (sampling.rs:121-125);
- ``gtr1.sample`` omits the sqrt on cos_theta (sampling.rs:132 vs Disney).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import linalg as la
from ..core.dtypes import NP_REAL, REAL

PI = NP_REAL(jnp.pi)


def cosine_sample_hemisphere(u1, u2):
    """sampling.rs:18-24. u1 -> phi, u2 -> r2 (draw order of the reference)."""
    phi = 2.0 * PI * u1
    r2s = jnp.sqrt(u2)
    return (r2s * jnp.cos(phi), r2s * jnp.sin(phi), jnp.sqrt(1.0 - u2))


def ggx_D(h, roughness):
    """sampling.rs:38-43. h is a local 3-tuple."""
    cos_theta = jnp.maximum(h[2], 0.001)
    alpha2 = jnp.maximum(roughness * roughness, 0.001)
    denom = (alpha2 - 1.0) * cos_theta * cos_theta + 1.0
    return alpha2 / (PI * denom * denom)


def ggx_G1(w, roughness):
    """sampling.rs:51-55."""
    alpha2 = jnp.maximum(roughness * roughness, 0.001)
    cos_theta = jnp.abs(w[2])
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
    vs = la.normalize3((v[0] * a2, v[1] * a2, v[2]))
    # orthonormal basis (sampling.rs:71-76): t1 = normalize(vs x z) or x-axis
    t1_generic = la.normalize3((vs[1], -vs[0], jnp.zeros_like(vs[0])), eps=1e-30)
    lo_z = vs[2] < 0.9999
    t1 = (
        jnp.where(lo_z, t1_generic[0], 1.0),
        jnp.where(lo_z, t1_generic[1], 0.0),
        jnp.zeros_like(vs[0]),
    )
    t2 = la.cross3(t1, vs)
    a = 1.0 / (1.0 + vs[2])
    r = jnp.sqrt(e1)
    lo = e2 < a
    phi = jnp.where(lo, e2 / a * PI, PI + (e2 - a) / (1.0 - a) * PI)
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi) * jnp.where(lo, 1.0, vs[2])
    pz = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    n = (
        p1 * t1[0] + p2 * t2[0] + pz * vs[0],
        p1 * t1[1] + p2 * t2[1] + pz * vs[1],
        p1 * t1[2] + p2 * t2[2] + pz * vs[2],
    )
    return la.normalize3((a2 * n[0], a2 * n[1], jnp.maximum(n[2], 0.0)), eps=1e-30)


def ggx_sample_microfacet_normal(v, roughness, e1, e2):
    """sampling.rs:57-64: VNDF sample with a2 = roughness^2, flipped to z >= 0."""
    h = _sample_ggx_vndf(v, roughness * roughness, e1, e2)
    neg = h[2] < 0.0
    return (
        jnp.where(neg, -h[0], h[0]),
        jnp.where(neg, -h[1], h[1]),
        jnp.where(neg, -h[2], h[2]),
    )


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
    h = (sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    neg = h[2] < 0.0
    return (
        jnp.where(neg, -h[0], h[0]),
        jnp.where(neg, -h[1], h[1]),
        jnp.where(neg, -h[2], h[2]),
    )


# -- fresnel (bsdf/mod.rs:74-97) --------------------------------------------


def fresnel_dielectric3(w, h, eta_i, eta_o):
    """Exact dielectric Fresnel (bsdf/mod.rs:77-88); 1.0 on TIR (g^2 < 0).

    Grad-safety (render/diff.py): sqrt arg floored at 1e-20 (sqrt(0) has an infinite
    local derivative, and 0-cotangent * inf = NaN poisons reverse-mode AD even on
    masked lanes) and the x denominator floored in magnitude (it crosses 0 at the
    TIR boundary with c=1). Both floors only bind on lanes the `where` masks out.
    """
    c = jnp.abs(la.dot3(w, h))
    g_squared = (eta_o / eta_i) ** 2 - 1.0 + c * c
    g = jnp.sqrt(jnp.maximum(g_squared, 1e-20))
    gmc = g - c
    gpc = g + c
    den = c * gmc + 1.0
    den = jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
    x = (c * gpc - 1.0) / den
    f = 0.5 * (gmc * gmc) / jnp.maximum(gpc * gpc, 1e-18) * (1.0 + x * x)
    return jnp.where(g_squared < 0.0, 1.0, f)


def fresnel_dielectric(w, h, eta_i, eta_o):
    """Array ([..,3]) wrapper kept for tests/tools."""
    return fresnel_dielectric3(la.unpack3(w), la.unpack3(h), eta_i, eta_o)


def pow5(x):
    """x^5 via multiplies — matches Rust `powi(5)` for negative bases too."""
    x2 = x * x
    return x2 * x2 * x


def fresnel_schlick3(r0, angle):
    """bsdf/mod.rs:90-92: r0 is an rgb 3-tuple, angle [B] (may be negative)."""
    w = pow5(1.0 - angle)
    return (r0[0] + (1.0 - r0[0]) * w, r0[1] + (1.0 - r0[1]) * w, r0[2] + (1.0 - r0[2]) * w)


def schlick_weight(x):
    """bsdf/mod.rs:94-96."""
    return pow5(jnp.clip(1.0 - x, 0.0, 1.0))


def luminance3(c):
    return 0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2]


def tint3(base_color):
    """c_tint (bsdf/mod.rs:61-68): color / luminance, or 1 when black."""
    lum = luminance3(base_color)
    pos = lum > 0.0
    inv = 1.0 / jnp.where(pos, lum, 1.0)
    return (
        jnp.where(pos, base_color[0] * inv, 1.0),
        jnp.where(pos, base_color[1] * inv, 1.0),
        jnp.where(pos, base_color[2] * inv, 1.0),
    )


def r0_from_eta(eta):
    """bsdf/mod.rs:70-72."""
    return ((eta - 1.0) / (eta + 1.0)) ** 2

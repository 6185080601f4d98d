"""Material shading: sample / pdf / eval for all five material families.

TPU re-design of the reference's ``BxDFMaterial`` trait objects (bsdf/mod.rs:21-57):
instead of virtual dispatch per ray, every lane evaluates all families branchlessly and
the result is selected by the material type tag — the standard wide-SIMD shading model.
Normal conventions follow the reference exactly:

- Diffuse / Metal / Glass shade in the *shading* normal frame (possibly normal-mapped),
  diffuse.rs:51-65, metal.rs:39-80, glass.rs:66-163;
- Principled shades in the *geometric* (front-face-flipped) normal frame — it ignores
  normal maps (principled.rs:103,108,122,146,284-285,323-324);
- DiffuseLight: sample is invalid, pdf = 1, eval = (1,1,1) (material.rs:167-178).

RNG slots consumed per bounce (see core/rng.py): SLOT_BSDF supplies (e1, e2, fresnel_u)
for the microfacet sample and the reflect/refract coin; the lobe pick comes from
SLOT_CTRL's fourth lane.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import linalg as la
from ..scene import data as D
from . import sampling as S
from .texture import eval_scalar_texture, eval_texture

PI = jnp.float32(jnp.pi)


@dataclasses.dataclass(frozen=True)
class Shade:
    """Per-lane shading context gathered once per bounce."""

    mtype: jnp.ndarray  # [B] int32
    base_color: jnp.ndarray  # [B,3]
    roughness: jnp.ndarray  # [B] (metal/glass textured roughness)
    params: jnp.ndarray  # [B,N_PARAMS] (principled; ior shared with glass)
    emission: jnp.ndarray  # [B,3] (light family)
    ng: jnp.ndarray  # [B,3] geometric normal, front-face flipped
    ns: jnp.ndarray  # [B,3] shading normal (normal-mapped for diffuse)
    front: jnp.ndarray  # [B] bool
    point: jnp.ndarray  # [B,3]


jax.tree_util.register_pytree_node(
    Shade,
    lambda s: (
        (s.mtype, s.base_color, s.roughness, s.params, s.emission, s.ng, s.ns, s.front, s.point),
        None,
    ),
    lambda _, xs: Shade(*xs),
)


def make_shade(sd: "D.SceneData", mat_id, u, v, point, ng, ns, front) -> Shade:
    mtype = sd.mat_type[mat_id]
    base_color = eval_texture(sd, sd.mat_tex[mat_id], u, v, point)
    roughness = eval_scalar_texture(sd, sd.mat_rough_tex[mat_id], u, v, point)
    params = sd.mat_params[mat_id]
    is_light = mtype == D.MAT_LIGHT
    # emission = the material texture evaluated as color (material.rs:184-186)
    emission = jnp.where(is_light[..., None], base_color, 0.0)
    return Shade(mtype, base_color, roughness, params, emission, ng, ns, front, point)


def _etas(sh: Shade, ior):
    """(eta_i, eta_o) by front_face (glass.rs:73-77, principled.rs:125-129)."""
    eta_i = jnp.where(sh.front, 1.0, ior)
    eta_o = jnp.where(sh.front, ior, 1.0)
    return eta_i, eta_o


def _half_vector(v, l, eta_i, eta_o, reflect):
    """Half vector from reflect/refract branch (glass.rs:103-107, principled.rs:294-298)."""
    h_refl = la.normalize(v + l, eps=1e-30) * jnp.sign(v[..., 2:3])
    h_refr = -la.normalize(l * eta_o[..., None] + v * eta_i[..., None], eps=1e-30)
    return jnp.where(reflect[..., None], h_refl, h_refr)


def _vndf_pdf_h(v, h, roughness):
    """VNDF density over half-vectors: G1 |v.h| D / |v.z| (metal.rs:62, glass.rs:110)."""
    return (
        S.ggx_G1(v, roughness)
        * jnp.abs(la.dot(v, h))
        * S.ggx_D(h, roughness)
        / jnp.maximum(jnp.abs(v[..., 2]), 1e-20)
    )


# ===========================================================================
# Diffuse (bsdf/diffuse.rs) — shading normal
# ===========================================================================


def _diffuse_sample(sh: Shade, e1, e2):
    local = S.cosine_sample_hemisphere(e1, e2)
    return la.to_world(sh.ns, local), jnp.ones(sh.front.shape, dtype=bool)


def _diffuse_pdf(sh: Shade, l_world):
    lz = la.dot(sh.ns, l_world)  # == to_local(ns, l).z
    return jnp.abs(lz) / PI


def _diffuse_eval(sh: Shade, l_world):
    lz = la.dot(sh.ns, l_world)
    return jnp.abs(lz)[..., None] * sh.base_color / PI


# ===========================================================================
# Metal (bsdf/metal.rs) — shading normal, textured roughness
# ===========================================================================


def _metal_sample(sh: Shade, v_world, e1, e2):
    v = la.to_local(sh.ns, v_world)
    h = S.ggx_sample_microfacet_normal(v, sh.roughness, e1, e2)
    d_local = la.reflect(-v, h)
    d_world = la.to_world(sh.ns, d_local)
    valid = la.dot(d_world, sh.ns) > 0.0  # metal.rs:49-53
    return d_world, valid


def _metal_pdf(sh: Shade, v_world, l_world):
    v = la.to_local(sh.ns, v_world)
    l = la.to_local(sh.ns, l_world)
    h = la.normalize(v + l, eps=1e-30)
    jac = 1.0 / jnp.maximum(4.0 * jnp.abs(la.dot(l, h)), 1e-20)
    return _vndf_pdf_h(v, h, sh.roughness) * jac


def _metal_eval(sh: Shade, v_world, l_world):
    v = la.to_local(sh.ns, v_world)
    l = la.to_local(sh.ns, l_world)
    h = la.normalize(v + l, eps=1e-30)
    d = S.ggx_D(h, sh.roughness)
    g = S.ggx_G(v, l, sh.roughness)
    f = S.fresnel_schlick(sh.base_color, la.dot(l, h))
    lz = jnp.abs(l[..., 2])
    vz = jnp.abs(v[..., 2])
    denom = jnp.maximum(4.0 * lz * vz, 1e-20)
    return lz[..., None] * f * (g * d / denom)[..., None]


# ===========================================================================
# Glass (bsdf/glass.rs) — shading normal, exact dielectric fresnel
# ===========================================================================


def _glass_sample(sh: Shade, v_world, e1, e2, fresnel_u):
    ior = sh.params[..., D.P_IOR]
    v = la.to_local(sh.ns, v_world)
    h = S.ggx_sample_microfacet_normal(v, sh.roughness, e1, e2)
    eta_i, eta_o = _etas(sh, ior)
    f = S.fresnel_dielectric(v, h, eta_i, eta_o)
    refl = la.reflect(-v, h)
    refr = la.refract(-v, h, eta_i / eta_o)
    # TIR fallback: refract returned 0 -> reflect (glass.rs:85-87)
    tir = la.length_sq(refr) == 0.0
    trans = jnp.where(tir[..., None], refl, refr)
    d_local = jnp.where((fresnel_u < f)[..., None], refl, trans)
    return la.to_world(sh.ns, d_local), jnp.ones(sh.front.shape, dtype=bool)


def _glass_pdf_eval(sh: Shade, v_world, l_world):
    """pdf and eval share every term (glass.rs:92-163); compute once."""
    ior = sh.params[..., D.P_IOR]
    v = la.to_local(sh.ns, v_world)
    l = la.to_local(sh.ns, l_world)
    reflect = l[..., 2] * v[..., 2] > 0.0
    eta_i, eta_o = _etas(sh, ior)
    h = _half_vector(v, l, eta_i, eta_o, reflect)

    f = S.fresnel_dielectric(v, h, eta_i, eta_o)
    v_dot_h = la.dot(v, h)
    l_dot_h = la.dot(l, h)
    refr_denom = (eta_i * v_dot_h + eta_o * l_dot_h) ** 2

    pdf_h = _vndf_pdf_h(v, h, sh.roughness)
    jac_refl = f / jnp.maximum(4.0 * jnp.abs(l_dot_h), 1e-20)
    jac_refr = (1.0 - f) * (eta_o * eta_o * jnp.abs(l_dot_h)) / jnp.maximum(refr_denom, 1e-20)
    pdf = pdf_h * jnp.where(reflect, jac_refl, jac_refr)

    d = S.ggx_D(h, sh.roughness)
    g = S.ggx_G(v, l, sh.roughness)
    lz = jnp.abs(l[..., 2])
    vz = jnp.abs(v[..., 2])
    fac_refl = f * g * d / jnp.maximum(4.0 * lz * vz, 1e-20)
    term1 = jnp.abs((l_dot_h * v_dot_h) / jnp.maximum(jnp.abs(l[..., 2] * v[..., 2]), 1e-20))
    term2 = (eta_o * eta_o) / jnp.maximum(refr_denom, 1e-20)
    fac_refr = term1 * term2 * (1.0 - f) * g * d
    factor = jnp.where(reflect, fac_refl, fac_refr)
    ev = (factor * lz)[..., None] * jnp.ones_like(sh.base_color)
    return pdf, ev


# ===========================================================================
# Principled (bsdf/principled.rs) — geometric normal, 4 lobes
# ===========================================================================


def _principled_lobes(params):
    """Lobe weights + normalized probabilities (principled.rs:79-100)."""
    metallic = params[..., D.P_METALLIC]
    spec_trans = params[..., D.P_SPEC_TRANS]
    clearcoat = params[..., D.P_CLEARCOAT]
    diffuse_wt = (1.0 - metallic) * (1.0 - spec_trans)
    specular_wt = 1.0 - spec_trans * (1.0 - metallic)
    glass_wt = spec_trans * (1.0 - metallic)
    clearcoat_wt = 0.25 * clearcoat
    inv_total = 1.0 / (diffuse_wt + specular_wt + glass_wt + clearcoat_wt)
    wts = (diffuse_wt, specular_wt, glass_wt, clearcoat_wt)
    probs = tuple(w * inv_total for w in wts)
    return wts, probs


def _principled_alpha_g(params):
    """principled.rs:75-77."""
    cg = params[..., D.P_CLEARCOAT_GLOSS]
    return (1.0 - cg) * 0.1 + cg * 0.001


def _principled_sample(sh: Shade, v_world, lobe_u, e1, e2, fresnel_u):
    params = sh.params
    roughness = params[..., D.P_ROUGHNESS]
    ior = params[..., D.P_IOR]
    _, (p_d, p_s, p_g, _) = _principled_lobes(params)
    n = sh.ng  # geometric normal throughout (principled.rs:103-155)
    v = la.to_local(n, v_world)

    # diffuse lobe
    d_diff = la.to_world(n, S.cosine_sample_hemisphere(e1, e2))

    # specular lobe (GGX VNDF reflect)
    h_ggx = S.ggx_sample_microfacet_normal(v, roughness, e1, e2)
    d_spec = la.to_world(n, la.reflect(-v, h_ggx))
    spec_ok = la.dot(d_spec, n) > 0.0

    # glass lobe (stochastic fresnel reflect/refract, shares h_ggx)
    eta_i, eta_o = _etas(sh, ior)
    f = S.fresnel_dielectric(v, h_ggx, eta_i, eta_o)
    refl = la.reflect(-v, h_ggx)
    refr = la.refract(-v, h_ggx, eta_i / eta_o)
    tir = la.length_sq(refr) == 0.0
    trans = jnp.where(tir[..., None], refl, refr)
    d_glass = la.to_world(n, jnp.where((fresnel_u < f)[..., None], refl, trans))

    # clearcoat lobe (GTR1, fixed alpha 0.25, principled.rs:144-155)
    h_cc = S.gtr1_sample_microfacet_normal(jnp.full_like(roughness, 0.25), e1, e2)
    d_cc = la.to_world(n, la.reflect(-v, h_cc))
    cc_ok = la.dot(d_cc, n) > 0.0

    use_d = lobe_u < p_d
    use_s = ~use_d & (lobe_u < p_d + p_s)
    use_g = ~use_d & ~use_s & (lobe_u < p_d + p_s + p_g)
    use_c = ~use_d & ~use_s & ~use_g

    direction = jnp.where(
        use_d[..., None],
        d_diff,
        jnp.where(use_s[..., None], d_spec, jnp.where(use_g[..., None], d_glass, d_cc)),
    )
    valid = use_d | (use_s & spec_ok) | use_g | (use_c & cc_ok)
    return direction, valid


def _principled_pdf(sh: Shade, v_world, l_world):
    params = sh.params
    roughness = params[..., D.P_ROUGHNESS]
    ior = params[..., D.P_IOR]
    _, (p_d, p_s, p_g, p_c) = _principled_lobes(params)
    n = sh.ng
    v = la.to_local(n, v_world)
    l = la.to_local(n, l_world)
    reflect = l[..., 2] * v[..., 2] > 0.0
    eta_i, eta_o = _etas(sh, ior)
    h = _half_vector(v, l, eta_i, eta_o, reflect)

    l_dot_h = la.dot(l, h)
    jac_refl = 1.0 / jnp.maximum(4.0 * jnp.abs(l_dot_h), 1e-20)

    pdf_diffuse = jnp.abs(l[..., 2]) / PI
    pdf_spec = _vndf_pdf_h(v, h, roughness) * jac_refl

    f = S.fresnel_dielectric(v, h, eta_i, eta_o)
    v_dot_h = la.dot(v, h)
    refr_denom = (eta_i * v_dot_h + eta_o * l_dot_h) ** 2
    jac_glass = jnp.where(
        reflect,
        f * jac_refl,
        (1.0 - f) * (eta_o * eta_o * jnp.abs(l_dot_h)) / jnp.maximum(refr_denom, 1e-20),
    )
    pdf_glass = _vndf_pdf_h(v, h, roughness) * jac_glass

    # clearcoat: GTR1 D at |l.h|, G1 with 0.25 (principled.rs:187-192)
    pdf_cc_h = (
        S.ggx_G1(v, jnp.full_like(roughness, 0.25))
        * jnp.abs(v_dot_h)
        * S.gtr1_D(jnp.abs(l_dot_h), _principled_alpha_g(params))
        / jnp.maximum(jnp.abs(v[..., 2]), 1e-20)
    )
    pdf_cc = pdf_cc_h * jac_refl

    pdf = jnp.zeros_like(pdf_diffuse)
    pdf += jnp.where((p_d > 0.0) & reflect, p_d * pdf_diffuse, 0.0)
    pdf += jnp.where((p_s > 0.0) & reflect, p_s * pdf_spec, 0.0)
    pdf += jnp.where(p_g > 0.0, p_g * pdf_glass, 0.0)
    pdf += jnp.where((p_c > 0.0) & reflect, p_c * pdf_cc, 0.0)
    return pdf


def _principled_eval(sh: Shade, v_world, l_world):
    params = sh.params
    base_color = sh.base_color
    roughness = params[..., D.P_ROUGHNESS]
    ior = params[..., D.P_IOR]
    (w_d, w_s, w_g, w_c), (p_d, p_s, p_g, p_c) = _principled_lobes(params)
    n = sh.ng
    v = la.to_local(n, v_world)
    l = la.to_local(n, l_world)
    reflect = l[..., 2] * v[..., 2] > 0.0
    eta_i, eta_o = _etas(sh, ior)
    h = _half_vector(v, l, eta_i, eta_o, reflect)
    l_dot_h = la.dot(l, h)
    v_dot_h = la.dot(v, h)
    lz, vz = l[..., 2], v[..., 2]

    # ---- diffuse + retro + subsurface + sheen (principled.rs:196-213,341-345) ----
    rr = 2.0 * roughness * l_dot_h * l_dot_h
    fl = S.schlick_weight(lz)
    fv = S.schlick_weight(vz)
    f_retro = rr * (fl + fv + fl * fv * (rr - 1.0))
    f_d = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv)
    fss90 = 0.5 * rr
    lerp = lambda a, b, t: a + (b - a) * t  # noqa: E731
    f_ss = lerp(1.0, fss90, fl) * lerp(1.0, fss90, fv)
    ss = 1.25 * (f_ss * (1.0 / jnp.where(lz + vz != 0.0, lz + vz, 1e-20) - 0.5) + 0.5)
    subsurface = params[..., D.P_SUBSURFACE]
    diffuse_term = base_color / PI * lerp(f_d + f_retro, ss, subsurface)[..., None]
    c_tint = S.tint(base_color)
    sheen_tint = params[..., D.P_SHEEN_TINT][..., None]
    c_sheen = lerp(jnp.ones_like(c_tint), c_tint, sheen_tint)
    sheen_term = (
        params[..., D.P_SHEEN][..., None] * c_sheen * S.schlick_weight(jnp.abs(l_dot_h))[..., None]
    )
    brdf_diffuse = w_d[..., None] * (diffuse_term + sheen_term)

    # ---- specular with metallic-lerped fresnel (principled.rs:347-356) ----
    metallic = params[..., D.P_METALLIC][..., None]
    ks = lerp(jnp.ones_like(c_tint), c_tint, params[..., D.P_SPECULAR_TINT][..., None])
    c0 = lerp(
        params[..., D.P_SPECULAR][..., None] * S.r0_from_eta(eta_i / eta_o)[..., None] * ks,
        base_color,
        metallic,
    )
    metal_f = S.fresnel_schlick(c0, l_dot_h)
    diel_f = S.fresnel_dielectric(v, h, eta_i, eta_o)[..., None]
    fresnel = lerp(diel_f, metal_f, metallic)
    d_ggx = S.ggx_D(h, roughness)
    g_ggx = S.ggx_G(v, l, roughness)
    denom4 = jnp.maximum(4.0 * jnp.abs(lz) * jnp.abs(vz), 1e-20)
    brdf_spec = w_s[..., None] * fresnel * (g_ggx * d_ggx / denom4)[..., None]

    # ---- glass (principled.rs:226-246) ----
    f_diel = S.fresnel_dielectric(v, h, eta_i, eta_o)
    refr_denom = (eta_i * v_dot_h + eta_o * l_dot_h) ** 2
    fac_refl = f_diel * g_ggx * d_ggx / denom4
    term1 = jnp.abs((l_dot_h * v_dot_h) / jnp.where(lz * vz != 0.0, lz * vz, 1e-20))
    term2 = (eta_o * eta_o) / jnp.maximum(refr_denom, 1e-20)
    fac_refr = term1 * term2 * (1.0 - f_diel) * g_ggx * d_ggx
    brdf_glass = (w_g * jnp.where(reflect, fac_refl, fac_refr))[..., None] * jnp.ones_like(
        base_color
    )

    # ---- clearcoat (principled.rs:248-258) — note the extra |l.z| in the reference ----
    d_cc = S.gtr1_D(jnp.abs(l_dot_h), _principled_alpha_g(params))
    g_cc = S.ggx_G(v, l, jnp.full_like(roughness, 0.25))
    f_cc = S.fresnel_schlick(
        jnp.broadcast_to(S.r0_from_eta(jnp.float32(1.5)), base_color.shape), l_dot_h
    )
    brdf_cc = (
        w_c[..., None]
        * jnp.abs(lz)[..., None]
        * f_cc
        * (d_cc * g_cc / denom4)[..., None]
    )

    brdf = jnp.zeros_like(base_color)
    brdf += jnp.where(((p_d > 0.0) & reflect)[..., None], brdf_diffuse, 0.0)
    brdf += jnp.where(((p_s > 0.0) & reflect)[..., None], brdf_spec, 0.0)
    brdf += jnp.where((p_g > 0.0)[..., None], brdf_glass, 0.0)
    brdf += jnp.where(((p_c > 0.0) & reflect)[..., None], brdf_cc, 0.0)
    return brdf * jnp.abs(lz)[..., None]


# ===========================================================================
# dispatch
# ===========================================================================


def bsdf_sample(sh: Shade, v_world, lobe_u, e1, e2, fresnel_u):
    """Sample an incident direction; returns (dir [B,3], valid [B] bool).

    Mirrors BxDFMaterial::sample returning Option (None -> valid=False kills the
    path, camera.rs:209-211). DiffuseLight always returns None (material.rs:167-169).
    """
    d_diff, ok_diff = _diffuse_sample(sh, e1, e2)
    d_metal, ok_metal = _metal_sample(sh, v_world, e1, e2)
    d_glass, ok_glass = _glass_sample(sh, v_world, e1, e2, fresnel_u)
    d_prin, ok_prin = _principled_sample(sh, v_world, lobe_u, e1, e2, fresnel_u)

    t = sh.mtype
    direction = jnp.where(
        (t == D.MAT_DIFFUSE)[..., None],
        d_diff,
        jnp.where(
            (t == D.MAT_METAL)[..., None],
            d_metal,
            jnp.where((t == D.MAT_GLASS)[..., None], d_glass, d_prin),
        ),
    )
    valid = jnp.select(
        [t == D.MAT_DIFFUSE, t == D.MAT_METAL, t == D.MAT_GLASS, t == D.MAT_PRINCIPLED],
        [ok_diff, ok_metal, ok_glass, ok_prin],
        default=jnp.zeros_like(ok_diff),  # MAT_LIGHT: sample -> None
    )
    return direction, valid


def bsdf_pdf(sh: Shade, v_world, l_world):
    """BxDFMaterial::pdf dispatch; DiffuseLight pdf = 1 (material.rs:171-173)."""
    t = sh.mtype
    glass_pdf, _ = _glass_pdf_eval(sh, v_world, l_world)
    return jnp.select(
        [t == D.MAT_DIFFUSE, t == D.MAT_METAL, t == D.MAT_GLASS, t == D.MAT_PRINCIPLED],
        [
            _diffuse_pdf(sh, l_world),
            _metal_pdf(sh, v_world, l_world),
            glass_pdf,
            _principled_pdf(sh, v_world, l_world),
        ],
        default=jnp.ones_like(sh.roughness),  # MAT_LIGHT
    )


def bsdf_eval(sh: Shade, v_world, l_world):
    """BxDFMaterial::eval dispatch; DiffuseLight eval = ONE (material.rs:175-178)."""
    t = sh.mtype
    _, glass_ev = _glass_pdf_eval(sh, v_world, l_world)
    out = jnp.where(
        (t == D.MAT_DIFFUSE)[..., None],
        _diffuse_eval(sh, l_world),
        jnp.where(
            (t == D.MAT_METAL)[..., None],
            _metal_eval(sh, v_world, l_world),
            jnp.where(
                (t == D.MAT_GLASS)[..., None],
                glass_ev,
                jnp.where(
                    (t == D.MAT_PRINCIPLED)[..., None],
                    _principled_eval(sh, v_world, l_world),
                    jnp.ones_like(glass_ev),  # MAT_LIGHT
                ),
            ),
        ),
    )
    return out

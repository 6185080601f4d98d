"""Material shading: sample / pdf / eval for all five material families.

TPU re-design of the reference's ``BxDFMaterial`` trait objects (bsdf/mod.rs:21-57):
instead of virtual dispatch per ray, every lane evaluates the material families present
in the scene branchlessly and the result is selected by the material type tag — the
standard wide-SIMD shading model, with two TPU twists:

- all math is component-form ([B] arrays per vector component, core/linalg.py SoA
  notes) so intermediates ride the full 128-lane axis;
- dispatch is *specialized per scene*: ``Shade.mat_types`` is a static tuple baked
  into the jit cache key, so branches for absent families compile out entirely
  (e.g. the balls scene never builds the Disney evaluation graph).

Normal conventions follow the reference exactly:
- Diffuse / Metal / Glass shade in the *shading* normal frame (possibly normal-mapped),
  diffuse.rs:51-65, metal.rs:39-80, glass.rs:66-163;
- Principled shades in the *geometric* (front-face-flipped) normal frame — it ignores
  normal maps (principled.rs:103,108,122,146,284-285,323-324);
- DiffuseLight: sample is invalid, pdf = 1, eval = (1,1,1) (material.rs:167-178).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import linalg as la
from ..scene import data as D
from . import sampling as S
from .gather import take_rows
from .texture import eval_scalar_texture, eval_texture
from ..core.dtypes import NP_REAL, REAL

PI = NP_REAL(jnp.pi)


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
    mat_types: tuple = ()  # static: families present (empty = assume all)


jax.tree_util.register_pytree_node(
    Shade,
    lambda s: (
        (s.mtype, s.base_color, s.roughness, s.params, s.emission, s.ng, s.ns, s.front, s.point),
        s.mat_types,
    ),
    lambda aux, xs: Shade(*xs, mat_types=aux),
)

_ALL_TYPES = (D.MAT_DIFFUSE, D.MAT_METAL, D.MAT_GLASS, D.MAT_PRINCIPLED, D.MAT_LIGHT)


def _types(sh: Shade):
    return sh.mat_types if sh.mat_types else _ALL_TYPES


def make_shade(sd: "D.SceneData", mat_id, u, v, point, ng, ns, front) -> Shade:
    mat_types = sd.mat_types if sd.mat_types else _ALL_TYPES
    needs_rough = (D.MAT_METAL in mat_types) or (D.MAT_GLASS in mat_types)
    fold_rough = needs_rough and sd.rough_all_solid
    # one fused row gather: [type, tex, rough] + params. When every roughness
    # texture in the scene is SOLID (rough_all_solid — true for all reference
    # scenes), the roughness VALUE rides the material row directly: the [M]-row
    # tex_rgb pre-gather below is ~45 elements (free) and replaces the whole
    # per-lane eval_scalar_texture machinery (2 more B-lane gathers + image
    # select). Values are identical (solid eval returns the tex_rgb row) and
    # the gradient path to the tex_rgb leaf is the same linear map.
    if fold_rough:
        rough_col = jnp.take(
            sd.tex_rgb, jnp.maximum(sd.mat_rough_tex, 0), axis=0
        )[:, 0]
    else:
        rough_col = sd.mat_rough_tex.astype(REAL)
    head = jnp.stack(
        [sd.mat_type.astype(REAL), sd.mat_tex.astype(REAL), rough_col],
        axis=1,
    )
    rows = take_rows(jnp.concatenate([head, sd.mat_params], axis=1), mat_id)
    mtype = rows[..., 0].astype(jnp.int32)
    tex_id = rows[..., 1].astype(jnp.int32)
    params = rows[..., 3:]

    base_color = eval_texture(sd, tex_id, u, v, point)
    if fold_rough:
        roughness = rows[..., 2]
    elif needs_rough:
        rough_tex = rows[..., 2].astype(jnp.int32)
        roughness = eval_scalar_texture(sd, rough_tex, u, v, point)
    else:
        roughness = jnp.zeros_like(u)
    if D.MAT_LIGHT in mat_types:
        is_light = mtype == D.MAT_LIGHT
        # emission = the material texture evaluated as color (material.rs:184-186)
        emission = jnp.where(is_light[..., None], base_color, 0.0)
    else:
        emission = jnp.zeros_like(base_color)
    return Shade(
        mtype, base_color, roughness, params, emission, ng, ns, front, point, mat_types
    )


def _etas(sh: Shade, ior):
    """(eta_i, eta_o) by front_face (glass.rs:73-77, principled.rs:125-129).

    ior floored at 0.01: branchless dispatch evaluates the glass family on every
    lane, and non-glass material rows carry P_IOR = 0 — eta ratios of inf/inf mint
    NaNs that survive the type-select masking in reverse-mode AD (render/diff.py).
    """
    ior = jnp.maximum(ior, 0.01)
    eta_i = jnp.where(sh.front, 1.0, ior)
    eta_o = jnp.where(sh.front, ior, 1.0)
    return eta_i, eta_o


def _half_vector(v, l, eta_i, eta_o, reflect):
    """Half vector from reflect/refract branch (glass.rs:103-107, principled.rs:294-298)."""
    h_refl = la.scale3(la.normalize3(la.add3(v, l), eps=1e-30), jnp.sign(v[2]))
    h_refr = la.neg3(
        la.normalize3(
            (
                l[0] * eta_o + v[0] * eta_i,
                l[1] * eta_o + v[1] * eta_i,
                l[2] * eta_o + v[2] * eta_i,
            ),
            eps=1e-30,
        )
    )
    return la.where3(reflect, h_refl, h_refr)


def _vndf_pdf_h(v, h, roughness):
    """VNDF density over half-vectors: G1 |v.h| D / |v.z| (metal.rs:62, glass.rs:110)."""
    return (
        S.ggx_G1(v, roughness)
        * jnp.abs(la.dot3(v, h))
        * S.ggx_D(h, roughness)
        / jnp.maximum(jnp.abs(v[2]), 1e-12)
    )


# ===========================================================================
# Diffuse (bsdf/diffuse.rs) — shading normal
# ===========================================================================


def _diffuse_sample(ns, e1, e2):
    local = S.cosine_sample_hemisphere(e1, e2)
    d = la.to_world3(ns, local)
    return d, jnp.ones_like(e1, dtype=bool)


def _diffuse_pdf(ns, l):
    return jnp.abs(la.dot3(ns, l)) / PI  # == |to_local(ns, l).z| / pi


def _diffuse_eval(base, ns, l):
    lz = jnp.abs(la.dot3(ns, l)) / PI
    return (lz * base[0], lz * base[1], lz * base[2])


# ===========================================================================
# Metal (bsdf/metal.rs) — shading normal, textured roughness
# ===========================================================================


def _metal_sample(ns, rough, v_world, e1, e2):
    v = la.to_local3(ns, v_world)
    h = S.ggx_sample_microfacet_normal(v, rough, e1, e2)
    d_local = la.reflect3(la.neg3(v), h)
    d = la.to_world3(ns, d_local)
    valid = la.dot3(d, ns) > 0.0  # metal.rs:49-53
    return d, valid


def _metal_pdf(ns, rough, v_world, l_world):
    v = la.to_local3(ns, v_world)
    l = la.to_local3(ns, l_world)
    h = la.normalize3(la.add3(v, l), eps=1e-30)
    jac = 1.0 / jnp.maximum(4.0 * jnp.abs(la.dot3(l, h)), 1e-15)
    return _vndf_pdf_h(v, h, rough) * jac


def _metal_eval(base, ns, rough, v_world, l_world):
    v = la.to_local3(ns, v_world)
    l = la.to_local3(ns, l_world)
    h = la.normalize3(la.add3(v, l), eps=1e-30)
    d = S.ggx_D(h, rough)
    g = S.ggx_G(v, l, rough)
    f = S.fresnel_schlick3(base, la.dot3(l, h))
    lz = jnp.abs(l[2])
    vz = jnp.abs(v[2])
    k = lz * (g * d / jnp.maximum(4.0 * lz * vz, 1e-15))
    return (k * f[0], k * f[1], k * f[2])


# ===========================================================================
# Glass (bsdf/glass.rs) — shading normal, exact dielectric fresnel
# ===========================================================================


def _glass_sample(sh: Shade, ns, rough, v_world, e1, e2, fresnel_u):
    ior = sh.params[..., D.P_IOR]
    v = la.to_local3(ns, v_world)
    h = S.ggx_sample_microfacet_normal(v, rough, e1, e2)
    eta_i, eta_o = _etas(sh, ior)
    f = S.fresnel_dielectric3(v, h, eta_i, eta_o)
    refl = la.reflect3(la.neg3(v), h)
    refr = la.refract3(la.neg3(v), h, eta_i / eta_o)
    tir = la.dot3(refr, refr) == 0.0  # refract returned 0 -> reflect (glass.rs:85-87)
    trans = la.where3(tir, refl, refr)
    d_local = la.where3(fresnel_u < f, refl, trans)
    return la.to_world3(ns, d_local), jnp.ones_like(e1, dtype=bool)


def _glass_pdf_eval(sh: Shade, ns, rough, v_world, l_world):
    """pdf and eval share every term (glass.rs:92-163); compute once."""
    ior = sh.params[..., D.P_IOR]
    v = la.to_local3(ns, v_world)
    l = la.to_local3(ns, l_world)
    reflect = l[2] * v[2] > 0.0
    eta_i, eta_o = _etas(sh, ior)
    h = _half_vector(v, l, eta_i, eta_o, reflect)

    f = S.fresnel_dielectric3(v, h, eta_i, eta_o)
    v_dot_h = la.dot3(v, h)
    l_dot_h = la.dot3(l, h)
    refr_denom = (eta_i * v_dot_h + eta_o * l_dot_h) ** 2

    pdf_h = _vndf_pdf_h(v, h, rough)
    jac_refl = f / jnp.maximum(4.0 * jnp.abs(l_dot_h), 1e-15)
    jac_refr = (1.0 - f) * (eta_o * eta_o * jnp.abs(l_dot_h)) / jnp.maximum(refr_denom, 1e-15)
    pdf = pdf_h * jnp.where(reflect, jac_refl, jac_refr)

    d = S.ggx_D(h, rough)
    g = S.ggx_G(v, l, rough)
    lz = jnp.abs(l[2])
    vz = jnp.abs(v[2])
    fac_refl = f * g * d / jnp.maximum(4.0 * lz * vz, 1e-15)
    term1 = jnp.abs((l_dot_h * v_dot_h) / jnp.maximum(jnp.abs(l[2] * v[2]), 1e-15))
    term2 = (eta_o * eta_o) / jnp.maximum(refr_denom, 1e-15)
    fac_refr = term1 * term2 * (1.0 - f) * g * d
    ev = jnp.where(reflect, fac_refl, fac_refr) * lz
    return pdf, ev  # eval is achromatic: Vec3::splat (glass.rs:153,160)


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


def _principled_sample(sh: Shade, n, v_world, lobe_u, e1, e2, fresnel_u):
    params = sh.params
    roughness = params[..., D.P_ROUGHNESS]
    ior = params[..., D.P_IOR]
    _, (p_d, p_s, p_g, _) = _principled_lobes(params)
    v = la.to_local3(n, v_world)  # geometric normal throughout (principled.rs:103-155)

    # diffuse lobe
    d_diff = la.to_world3(n, S.cosine_sample_hemisphere(e1, e2))

    # specular lobe (GGX VNDF reflect)
    h_ggx = S.ggx_sample_microfacet_normal(v, roughness, e1, e2)
    d_spec = la.to_world3(n, la.reflect3(la.neg3(v), h_ggx))
    spec_ok = la.dot3(d_spec, n) > 0.0

    # glass lobe (stochastic fresnel reflect/refract, shares h_ggx)
    eta_i, eta_o = _etas(sh, ior)
    f = S.fresnel_dielectric3(v, h_ggx, eta_i, eta_o)
    refl = la.reflect3(la.neg3(v), h_ggx)
    refr = la.refract3(la.neg3(v), h_ggx, eta_i / eta_o)
    tir = la.dot3(refr, refr) == 0.0
    trans = la.where3(tir, refl, refr)
    d_glass = la.to_world3(n, la.where3(fresnel_u < f, refl, trans))

    # clearcoat lobe (GTR1, fixed alpha 0.25, principled.rs:144-155)
    h_cc = S.gtr1_sample_microfacet_normal(jnp.full_like(roughness, 0.25), e1, e2)
    d_cc = la.to_world3(n, la.reflect3(la.neg3(v), h_cc))
    cc_ok = la.dot3(d_cc, n) > 0.0

    use_d = lobe_u < p_d
    use_s = ~use_d & (lobe_u < p_d + p_s)
    use_g = ~use_d & ~use_s & (lobe_u < p_d + p_s + p_g)
    use_c = ~use_d & ~use_s & ~use_g

    direction = la.where3(use_d, d_diff, la.where3(use_s, d_spec, la.where3(use_g, d_glass, d_cc)))
    valid = use_d | (use_s & spec_ok) | use_g | (use_c & cc_ok)
    return direction, valid


def _principled_pdf(sh: Shade, n, v_world, l_world):
    params = sh.params
    roughness = params[..., D.P_ROUGHNESS]
    ior = params[..., D.P_IOR]
    _, (p_d, p_s, p_g, p_c) = _principled_lobes(params)
    v = la.to_local3(n, v_world)
    l = la.to_local3(n, l_world)
    reflect = l[2] * v[2] > 0.0
    eta_i, eta_o = _etas(sh, ior)
    h = _half_vector(v, l, eta_i, eta_o, reflect)

    l_dot_h = la.dot3(l, h)
    v_dot_h = la.dot3(v, h)
    jac_refl = 1.0 / jnp.maximum(4.0 * jnp.abs(l_dot_h), 1e-15)

    pdf_diffuse = jnp.abs(l[2]) / PI
    pdf_spec = _vndf_pdf_h(v, h, roughness) * jac_refl

    f = S.fresnel_dielectric3(v, h, eta_i, eta_o)
    refr_denom = (eta_i * v_dot_h + eta_o * l_dot_h) ** 2
    jac_glass = jnp.where(
        reflect,
        f * jac_refl,
        (1.0 - f) * (eta_o * eta_o * jnp.abs(l_dot_h)) / jnp.maximum(refr_denom, 1e-15),
    )
    pdf_glass = _vndf_pdf_h(v, h, roughness) * jac_glass

    # clearcoat: GTR1 D at |l.h|, G1 with 0.25 (principled.rs:187-192)
    quarter = jnp.full_like(roughness, 0.25)
    pdf_cc_h = (
        S.ggx_G1(v, quarter)
        * jnp.abs(v_dot_h)
        * S.gtr1_D(jnp.abs(l_dot_h), _principled_alpha_g(params))
        / jnp.maximum(jnp.abs(v[2]), 1e-12)
    )
    pdf_cc = pdf_cc_h * jac_refl

    pdf = jnp.zeros_like(pdf_diffuse)
    pdf += jnp.where((p_d > 0.0) & reflect, p_d * pdf_diffuse, 0.0)
    pdf += jnp.where((p_s > 0.0) & reflect, p_s * pdf_spec, 0.0)
    pdf += jnp.where(p_g > 0.0, p_g * pdf_glass, 0.0)
    pdf += jnp.where((p_c > 0.0) & reflect, p_c * pdf_cc, 0.0)
    return pdf


def _principled_eval(sh: Shade, n, v_world, l_world):
    params = sh.params
    base = la.unpack3(sh.base_color)
    roughness = params[..., D.P_ROUGHNESS]
    ior = params[..., D.P_IOR]
    (w_d, w_s, w_g, w_c), (p_d, p_s, p_g, p_c) = _principled_lobes(params)
    v = la.to_local3(n, v_world)
    l = la.to_local3(n, l_world)
    reflect = l[2] * v[2] > 0.0
    eta_i, eta_o = _etas(sh, ior)
    h = _half_vector(v, l, eta_i, eta_o, reflect)
    l_dot_h = la.dot3(l, h)
    v_dot_h = la.dot3(v, h)
    lz, vz = l[2], v[2]
    lerp = lambda a, b, t: a + (b - a) * t  # noqa: E731

    # ---- diffuse + retro + subsurface + sheen (principled.rs:196-213,341-345) ----
    rr = 2.0 * roughness * l_dot_h * l_dot_h
    fl = S.schlick_weight(lz)
    fv = S.schlick_weight(vz)
    f_retro = rr * (fl + fv + fl * fv * (rr - 1.0))
    f_d = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv)
    fss90 = 0.5 * rr
    f_ss = lerp(1.0, fss90, fl) * lerp(1.0, fss90, fv)
    svz = lz + vz
    svz = jnp.where(jnp.abs(svz) > 1e-12, svz, jnp.where(svz < 0.0, -1e-12, 1e-12))
    ss = 1.25 * (f_ss * (1.0 / svz - 0.5) + 0.5)
    subsurface = params[..., D.P_SUBSURFACE]
    k_diff = lerp(f_d + f_retro, ss, subsurface) / PI
    c_tint = S.tint3(base)
    sheen_tint = params[..., D.P_SHEEN_TINT]
    sheen_w = params[..., D.P_SHEEN] * S.schlick_weight(jnp.abs(l_dot_h))
    diffuse_rgb = tuple(
        base[j] * k_diff + sheen_w * lerp(1.0, c_tint[j], sheen_tint) for j in range(3)
    )

    # ---- specular with metallic-lerped fresnel (principled.rs:347-356) ----
    metallic = params[..., D.P_METALLIC]
    spec_tint = params[..., D.P_SPECULAR_TINT]
    spec_amt = params[..., D.P_SPECULAR] * S.r0_from_eta(eta_i / eta_o)
    c0 = tuple(
        lerp(spec_amt * lerp(1.0, c_tint[j], spec_tint), base[j], metallic) for j in range(3)
    )
    metal_f = S.fresnel_schlick3(c0, l_dot_h)
    diel_f = S.fresnel_dielectric3(v, h, eta_i, eta_o)
    fresnel = tuple(lerp(diel_f, metal_f[j], metallic) for j in range(3))
    d_ggx = S.ggx_D(h, roughness)
    g_ggx = S.ggx_G(v, l, roughness)
    denom4 = jnp.maximum(4.0 * jnp.abs(lz) * jnp.abs(vz), 1e-15)
    k_spec = g_ggx * d_ggx / denom4
    spec_rgb = tuple(fresnel[j] * k_spec for j in range(3))

    # ---- glass (principled.rs:226-246), achromatic ----
    refr_denom = (eta_i * v_dot_h + eta_o * l_dot_h) ** 2
    fac_refl = diel_f * g_ggx * d_ggx / denom4
    pvz = lz * vz
    pvz = jnp.where(jnp.abs(pvz) > 1e-12, pvz, jnp.where(pvz < 0.0, -1e-12, 1e-12))
    term1 = jnp.abs((l_dot_h * v_dot_h) / pvz)
    term2 = (eta_o * eta_o) / jnp.maximum(refr_denom, 1e-15)
    fac_refr = term1 * term2 * (1.0 - diel_f) * g_ggx * d_ggx
    glass_k = jnp.where(reflect, fac_refl, fac_refr)

    # ---- clearcoat (principled.rs:248-258) — note the extra |l.z| in the reference ----
    d_cc = S.gtr1_D(jnp.abs(l_dot_h), _principled_alpha_g(params))
    quarter = jnp.full_like(roughness, 0.25)
    g_cc = S.ggx_G(v, l, quarter)
    r0_15 = S.r0_from_eta(REAL(1.5))
    f_cc = S.fresnel_schlick3(
        (jnp.full_like(lz, r0_15), jnp.full_like(lz, r0_15), jnp.full_like(lz, r0_15)), l_dot_h
    )
    k_cc = jnp.abs(lz) * d_cc * g_cc / denom4
    cc_rgb = tuple(f_cc[j] * k_cc for j in range(3))

    m_d = (p_d > 0.0) & reflect
    m_s = (p_s > 0.0) & reflect
    m_g = p_g > 0.0
    m_c = (p_c > 0.0) & reflect
    out = []
    for j in range(3):
        acc = jnp.where(m_d, w_d * diffuse_rgb[j], 0.0)
        acc += jnp.where(m_s, w_s * spec_rgb[j], 0.0)
        acc += jnp.where(m_g, w_g * glass_k, 0.0)
        acc += jnp.where(m_c, w_c * cc_rgb[j], 0.0)
        out.append(acc * jnp.abs(lz))
    return tuple(out)


# ===========================================================================
# dispatch (specialized by Shade.mat_types)
# ===========================================================================


def _select_by_type(sh, cases, default):
    """cases: list of (mat_type, value) for present types; value [B] or 3-tuple."""
    if not cases:
        return default
    out = default
    for t, val in cases:
        m = sh.mtype == t
        if isinstance(out, tuple):
            out = la.where3(m, val, out)
        else:
            out = jnp.where(m, val, out)
    return out


def bsdf_sample(sh: Shade, v_world, lobe_u, e1, e2, fresnel_u):
    """Sample an incident direction; returns (dir [B,3], valid [B] bool).

    Mirrors BxDFMaterial::sample returning Option (None -> valid=False kills the
    path, camera.rs:209-211). DiffuseLight always returns None (material.rs:167-169).
    """
    types = _types(sh)
    ns = la.unpack3(sh.ns)
    ng = la.unpack3(sh.ng)
    vw = la.unpack3(v_world)
    zeros = jnp.zeros_like(e1)
    dir_cases, ok_cases = [], []
    if D.MAT_DIFFUSE in types:
        d, ok = _diffuse_sample(ns, e1, e2)
        dir_cases.append((D.MAT_DIFFUSE, d))
        ok_cases.append((D.MAT_DIFFUSE, ok))
    if D.MAT_METAL in types:
        d, ok = _metal_sample(ns, sh.roughness, vw, e1, e2)
        dir_cases.append((D.MAT_METAL, d))
        ok_cases.append((D.MAT_METAL, ok))
    if D.MAT_GLASS in types:
        d, ok = _glass_sample(sh, ns, sh.roughness, vw, e1, e2, fresnel_u)
        dir_cases.append((D.MAT_GLASS, d))
        ok_cases.append((D.MAT_GLASS, ok))
    if D.MAT_PRINCIPLED in types:
        d, ok = _principled_sample(sh, ng, vw, lobe_u, e1, e2, fresnel_u)
        dir_cases.append((D.MAT_PRINCIPLED, d))
        ok_cases.append((D.MAT_PRINCIPLED, ok))
    direction = _select_by_type(sh, dir_cases, (zeros, zeros, jnp.ones_like(e1)))
    valid = _select_by_type(sh, ok_cases, jnp.zeros_like(e1, dtype=bool))  # MAT_LIGHT: None
    return la.pack3(direction), valid


def bsdf_pdf(sh: Shade, v_world, l_world):
    """BxDFMaterial::pdf dispatch; DiffuseLight pdf = 1 (material.rs:171-173)."""
    types = _types(sh)
    ns = la.unpack3(sh.ns)
    ng = la.unpack3(sh.ng)
    vw = la.unpack3(v_world)
    lw = la.unpack3(l_world)
    cases = []
    if D.MAT_DIFFUSE in types:
        cases.append((D.MAT_DIFFUSE, _diffuse_pdf(ns, lw)))
    if D.MAT_METAL in types:
        cases.append((D.MAT_METAL, _metal_pdf(ns, sh.roughness, vw, lw)))
    if D.MAT_GLASS in types:
        pdf, _ = _glass_pdf_eval(sh, ns, sh.roughness, vw, lw)
        cases.append((D.MAT_GLASS, pdf))
    if D.MAT_PRINCIPLED in types:
        cases.append((D.MAT_PRINCIPLED, _principled_pdf(sh, ng, vw, lw)))
    return _select_by_type(sh, cases, jnp.ones_like(sh.roughness))  # MAT_LIGHT: 1


def bsdf_eval(sh: Shade, v_world, l_world):
    """BxDFMaterial::eval dispatch; DiffuseLight eval = ONE (material.rs:175-178)."""
    types = _types(sh)
    ns = la.unpack3(sh.ns)
    ng = la.unpack3(sh.ng)
    vw = la.unpack3(v_world)
    lw = la.unpack3(l_world)
    base = la.unpack3(sh.base_color)
    ones = jnp.ones_like(sh.roughness)
    cases = []
    if D.MAT_DIFFUSE in types:
        cases.append((D.MAT_DIFFUSE, _diffuse_eval(base, ns, lw)))
    if D.MAT_METAL in types:
        cases.append((D.MAT_METAL, _metal_eval(base, ns, sh.roughness, vw, lw)))
    if D.MAT_GLASS in types:
        _, ev = _glass_pdf_eval(sh, ns, sh.roughness, vw, lw)
        cases.append((D.MAT_GLASS, (ev, ev, ev)))
    if D.MAT_PRINCIPLED in types:
        cases.append((D.MAT_PRINCIPLED, _principled_eval(sh, ng, vw, lw)))
    out = _select_by_type(sh, cases, (ones, ones, ones))  # MAT_LIGHT: ONE
    return la.pack3(out)

"""BSDF sample/pdf consistency (the invariant MIS depends on) + closed-form checks.

For each material family we draw many directions from bsdf_sample and verify the
empirical direction histogram against the bin-integrated bsdf_pdf (MC-estimated with
uniform sphere directions). This is the chi-square-style sampler test recommended in
SURVEY.md section 4 — the reference itself has no tests, so these are oracle-free
invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupt.ops import bsdf as B

# the sandbox compiles each eager op through a remote service (~0.4s/op), so every
# device computation in tests must run under one jit
_sample = jax.jit(B.bsdf_sample)
_pdf = jax.jit(B.bsdf_pdf)
_eval = jax.jit(B.bsdf_eval)
_mk_shade = jax.jit(B.make_shade)
from tpupt.scene.builder import Diffuse, Glass, Metal, Principled, Scene


def _shade_for(mat, n=(0.0, 0.0, 1.0), front=True, batch=1):
    """Build a Shade row for a single material on a flat surface."""
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, 0.0), mat)
    sd = s.compile().data
    ones = jnp.ones((batch,), jnp.float32)
    nvec = jnp.broadcast_to(jnp.asarray(n, jnp.float32), (batch, 3))
    sh = _mk_shade(
        sd,
        jnp.zeros((batch,), jnp.int32) + sd.sph_mat[0],
        ones * 0.5,
        ones * 0.5,
        jnp.zeros((batch, 3), jnp.float32),
        nvec,
        nvec,
        jnp.full((batch,), front, dtype=bool),
    )
    return sh


def _uniform_sphere(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def _histogram_check(
    mat, view_dir, front=True, n_samples=262_144, rtol=0.08, seed=0, density_mat=None
):
    """Empirical sample histogram ~= bin-integrated analytic density of the sampler.

    `density_mat` is the material whose bsdf_pdf equals the *actual* sampling
    density. Usually that is `mat` itself — but the reference's VNDF sampler
    stretches by roughness^2 (sampling.rs:66-68: ``sample_ggx_vndf(v, roughness *
    roughness)``) while its pdf/D use alpha = roughness (sampling.rs:38-43), so the
    Rust sample() and pdf() genuinely disagree for specular lobes. We reproduce both
    sides faithfully; the sampler's true density is then the pdf evaluated at
    roughness^2, which is what callers pass as density_mat.

    The comparison is restricted to bins the sampler actually reaches: several
    reference pdfs carry |cos| terms that are nonzero outside the sampled
    hemisphere (e.g. diffuse.rs:56-59).
    """
    batch = n_samples
    sh = _shade_for(mat, front=front, batch=batch)
    sh_pdf = sh if density_mat is None else _shade_for(density_mat, front=front, batch=batch)
    r = np.random.default_rng(seed)
    u = [jnp.asarray(r.random(batch), jnp.float32) for _ in range(4)]
    v_world = jnp.broadcast_to(jnp.asarray(view_dir, jnp.float32), (batch, 3))
    dirs, valid = _sample(sh, v_world, u[0], u[1], u[2], u[3])
    dirs = np.asarray(dirs)
    valid = np.asarray(valid)
    dirs = dirs[valid]
    frac_valid = valid.mean()

    # bins over (cos theta, phi)
    nz, nphi = 4, 4

    def binify(v):
        zb = np.clip(((v[:, 2] + 1.0) / 2.0 * nz).astype(int), 0, nz - 1)
        ph = np.arctan2(v[:, 1], v[:, 0])
        pb = np.clip(((ph + np.pi) / (2 * np.pi) * nphi).astype(int), 0, nphi - 1)
        return zb, pb

    counts = np.zeros((nz, nphi))
    np.add.at(counts, binify(dirs), 1)
    emp = counts / len(dirs)

    # pdf integral per bin via uniform-sphere MC (same batch shape -> shared jit)
    m = n_samples
    udirs = _uniform_sphere(m, seed + 1)
    pdf = np.asarray(_pdf(sh_pdf, v_world, jnp.asarray(udirs)))
    integ = np.zeros((nz, nphi))
    np.add.at(integ, binify(udirs), pdf)
    integ = integ / m * 4.0 * np.pi  # MC integral of pdf over each bin
    # pdf is a density over *attempted* samples; rejected ones renormalize
    integ = integ / max(frac_valid, 1e-9)

    support = emp > 1e-4
    total_support = integ[support].sum()
    assert abs(total_support - 1.0) < 0.1, f"pdf integral over support {total_support}"

    mask = support & (integ > 0.02)  # only bins with real mass
    np.testing.assert_allclose(emp[mask], integ[mask], rtol=rtol, atol=5e-3)


def test_diffuse_sample_pdf_consistent():
    _histogram_check(Diffuse((0.8, 0.4, 0.2)), (0.3, 0.2, 0.93))


def test_metal_sampler_density():
    # sampler's true density = pdf at roughness^2 (see _histogram_check docstring)
    _histogram_check(
        Metal((0.9, 0.8, 0.7), 0.5),
        (0.3, 0.0, 0.954),
        density_mat=Metal((0.9, 0.8, 0.7), 0.25),
    )


def test_metal_rough_one_sample_pdf_agree():
    """At roughness=1 the sampler/pdf alpha mismatch vanishes (1^2 == 1)."""
    _histogram_check(Metal((0.9, 0.8, 0.7), 1.0), (0.3, 0.0, 0.954))


def test_glass_sampler_density_entering():
    _histogram_check(
        Glass((1, 1, 1), 0.4, 1.5),
        (0.3, 0.0, 0.954),
        front=True,
        density_mat=Glass((1, 1, 1), 0.16, 1.5),
    )


def test_glass_exiting_behavior():
    """Exiting rays (front_face=false, glass.rs:73-77).

    The histogram-vs-pdf identity does NOT hold here by reference design: the pdf/eval
    reconstruct h = -(l*eta_o + v*eta_i) (glass.rs:106), which for exiting refraction
    points *into* the surface (h.z < 0), so ggx::D's 0.001 cosine floor
    (sampling.rs:39) collapses both pdf and eval; only their ratio stays finite.
    Assert the physical behaviors instead: refraction bends away from the normal,
    reflect/refract split tracks the exact Fresnel, and attenuation = eval/pdf is O(1).
    """
    batch = 262_144
    mat = Glass((1, 1, 1), 0.05, 1.5)
    sh = _shade_for(mat, front=False, batch=batch)
    r = np.random.default_rng(11)
    u = [jnp.asarray(r.random(batch), jnp.float32) for _ in range(4)]
    theta_i = 0.3
    v_world = jnp.broadcast_to(
        jnp.asarray([np.sin(theta_i), 0.0, np.cos(theta_i)], jnp.float32), (batch, 3)
    )
    dirs, valid = _sample(sh, v_world, u[0], u[1], u[2], u[3])
    dirs = np.asarray(dirs)
    assert np.asarray(valid).all()

    refr = dirs[:, 2] < 0
    frac_refl = 1.0 - refr.mean()
    # exact dielectric fresnel at normal-ish incidence from inside, eta 1.5->1
    from tpupt.ops.sampling import fresnel_dielectric

    f = float(
        fresnel_dielectric(
            jnp.asarray([[np.sin(theta_i), 0.0, np.cos(theta_i)]], jnp.float32),
            jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
            jnp.asarray([1.5], jnp.float32),
            jnp.asarray([1.0], jnp.float32),
        )[0]
    )
    assert abs(frac_refl - f) < 0.02, (frac_refl, f)

    # smooth glass: refraction angle obeys Snell (sin_out = 1.5 * sin_in)
    sin_out = np.hypot(dirs[refr][:, 0], dirs[refr][:, 1])
    np.testing.assert_allclose(np.median(sin_out), 1.5 * np.sin(theta_i), rtol=0.02)

    # attenuation stays O(1): the D collapse cancels between eval and pdf
    pdf = np.asarray(_pdf(sh, v_world, jnp.asarray(dirs)))
    ev = np.asarray(_eval(sh, v_world, jnp.asarray(dirs)))
    att = ev[:, 0] / np.maximum(pdf, 1e-30)
    med = np.median(att[refr])
    assert 0.3 < med < 3.0, med


def _principled(rough, clearcoat=0.0):
    return Principled(
        (0.7, 0.5, 0.3),
        metallic=0.3,
        roughness=rough,
        subsurface=0.2,
        specular=0.5,
        specular_tint=0.3,
        ior=1.5,
        spec_trans=0.4,
        sheen=0.5,
        sheen_tint=0.5,
        clearcoat=clearcoat,
        clearcoat_gloss=0.3,
    )


def test_principled_sampler_density():
    """All lobes except clearcoat (whose reference sampler is yet another analytic
    density: GTR1 sample at fixed alpha 0.25 *without* the sqrt, vs a pdf at
    alpha_g(gloss) — principled.rs:147,188). Specular/glass density via roughness^2."""
    _histogram_check(
        _principled(0.5, clearcoat=0.0),
        (0.3, 0.1, 0.949),
        rtol=0.12,
        density_mat=_principled(0.25, clearcoat=0.0),
    )


def test_principled_rough_one_all_lobes():
    """roughness=1: specular/glass sampler==pdf; include clearcoat via its own lobes?
    Clearcoat still mismatched by design, so keep it off and sweep the rest."""
    _histogram_check(_principled(1.0, clearcoat=0.0), (0.3, 0.1, 0.949), rtol=0.12)


def test_diffuse_closed_form():
    """diffuse: pdf = |cos|/pi, eval = |cos| * color / pi (diffuse.rs:56-65)."""
    sh = _shade_for(Diffuse((0.5, 0.6, 0.7)), batch=1)
    l = jnp.asarray([[0.0, np.sin(0.4), np.cos(0.4)]], jnp.float32)
    v = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    pdf = float(_pdf(sh, v, l)[0])
    np.testing.assert_allclose(pdf, np.cos(0.4) / np.pi, rtol=1e-5)
    ev = np.asarray(_eval(sh, v, l)[0])
    np.testing.assert_allclose(ev, np.cos(0.4) * np.asarray([0.5, 0.6, 0.7]) / np.pi, rtol=1e-5)


def test_light_material_conventions():
    """DiffuseLight: sample invalid, pdf=1, eval=ONE (material.rs:167-178)."""
    from tpupt.scene.builder import Light

    sh = _shade_for(Light((5.0, 4.0, 3.0)), batch=4)
    v = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (4, 3))
    u = jnp.full((4,), 0.5, jnp.float32)
    _, valid = _sample(sh, v, u, u, u, u)
    assert not np.asarray(valid).any()
    np.testing.assert_allclose(np.asarray(_pdf(sh, v, v)), 1.0)
    np.testing.assert_allclose(np.asarray(_eval(sh, v, v)), 1.0)
    np.testing.assert_allclose(np.asarray(sh.emission), [[5.0, 4.0, 3.0]] * 4)


def test_glass_energy_reasonable():
    """Smooth glass: sampled attenuation brdf/pdf should stay near base_color."""
    batch = 20_000
    sh = _shade_for(Glass((1, 1, 1), 0.001, 1.5), batch=batch)
    r = np.random.default_rng(3)
    u = [jnp.asarray(r.random(batch), jnp.float32) for _ in range(4)]
    v = jnp.broadcast_to(jnp.asarray([0.2, 0.0, 0.9798], jnp.float32), (batch, 3))
    dirs, valid = _sample(sh, v, u[0], u[1], u[2], u[3])
    pdf = _pdf(sh, v, dirs)
    ev = _eval(sh, v, dirs)
    att = np.asarray(ev) / np.maximum(np.asarray(pdf)[:, None], 1e-20)
    att = att[np.asarray(valid)]
    med = np.median(att[:, 0])
    assert 0.5 < med < 1.5, med

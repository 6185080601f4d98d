"""HDR environment importance sampling (NEW capability vs the reference, which
quantizes .hdr maps to u8 — texture.rs:63-68 — and never samples the environment).

Checks: alias-table sampling matches texel weights, the solid-angle pdf normalizes,
sample/pdf agree, the full MIS estimator stays unbiased with the env as a light
member (white furnace), HDR radiance survives >1, and gradients flow into env_img.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.ops.envmap import (
    build_env_tables,
    pdf_env_light,
    sample_env_light,
    sample_environment,
)
from tpupt.render.camera import Camera
from tpupt.render.diff import render_grads
from tpupt.render.renderer import render_image
from tpupt.scene.builder import Diffuse, ImageTexture, Scene


def _hdr_scene(img, add_sphere=True):
    s = Scene()
    if add_sphere:
        s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((1.0, 1.0, 1.0)))
    s.environment = ImageTexture(img, hdr=True)
    return s


def _cam(width=16, spp=16, depth=50):
    return Camera(
        aspect_ratio=1.0, image_width=width, samples_per_pixel=spp, max_depth=depth,
        vfov=30.0, look_from=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )


def _rand_map(h=8, w=16, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0.05, 4.0, size=(h, w, 3)).astype(np.float32)
    img[2, 5] = 80.0  # one hot texel, like a sun
    return img


def test_env_pdf_normalizes():
    img = _rand_map()
    h, w = img.shape[:2]
    _, _, pdf = build_env_tables(img)
    sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
    omega = (2 * np.pi / w) * (np.pi / h) * np.repeat(sin_t, w)
    np.testing.assert_allclose((pdf * omega).sum(), 1.0, rtol=1e-5)


def test_env_alias_sampling_matches_weights():
    img = _rand_map()
    h, w = img.shape[:2]
    sd = _hdr_scene(img, add_sphere=False).compile().data

    n = 200_000
    rng = np.random.default_rng(1)
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    dx, dy, dz = jax.jit(sample_env_light, static_argnums=())(sd, u1, u2)
    d = jnp.stack([dx, dy, dz], axis=-1)
    texel, _, _ = __import__("tpupt.ops.envmap", fromlist=["x"])._texel_from_dir(sd, d)
    counts = np.bincount(np.asarray(texel), minlength=h * w) / n

    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
    p = (lum * sin_t[:, None]).reshape(-1)
    p = p / p.sum()
    # 200k draws: per-texel rate within ~4 sigma
    sigma = np.sqrt(p * (1 - p) / n)
    assert np.all(np.abs(counts - p) < 4.5 * sigma + 1e-4)


def test_env_sample_pdf_consistency():
    img = _rand_map(seed=3)
    sd = _hdr_scene(img, add_sphere=False).compile().data
    rng = np.random.default_rng(2)
    u1 = jnp.asarray(rng.uniform(size=4096).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=4096).astype(np.float32))
    dx, dy, dz = sample_env_light(sd, u1, u2)
    d = jnp.stack([dx, dy, dz], axis=-1)
    pdf = pdf_env_light(sd, d)
    assert bool((pdf > 0).all())
    # direction of every sampled texel center maps back to a texel with the same pdf
    texel, _, _ = __import__("tpupt.ops.envmap", fromlist=["x"])._texel_from_dir(sd, d)
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(sd.env_pdf)[np.asarray(texel)], rtol=1e-6
    )


def test_env_hdr_values_preserved():
    """The reference clamps .hdr to [0,1] u8 (texture.rs:67); the hdr path must not."""
    img = _rand_map()
    sd = _hdr_scene(img, add_sphere=False).compile().data
    # direction at the hot texel's center (row 2, col 5)
    h, w = img.shape[:2]
    theta = (2 + 0.5) / h * np.pi
    phi = (5 + 0.5) / w * 2 * np.pi - np.pi
    d = jnp.asarray(
        [[np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)]],
        dtype=jnp.float32,
    )
    val = sample_environment(sd, d)
    np.testing.assert_allclose(np.asarray(val)[0], img[2, 5], rtol=1e-6)


def test_env_is_white_furnace():
    """Uniform HDR env of 1 + white Lambertian sphere must render to 1: the env-IS
    MIS estimator (env as light member, mixture pdf) must stay unbiased."""
    img = np.ones((8, 16, 3), dtype=np.float32)
    s = _hdr_scene(img)
    compiled = s.compile()
    assert compiled.data.env_is_hdr and compiled.has_lights
    cam = _cam(width=24, spp=64)
    _, mean, _ = render_image(compiled, cam, rays_per_launch=1 << 14, progress=False)
    # unlike pure cosine sampling (zero-variance in a furnace), the env-IS mixture
    # has per-bounce weight variance: check the image mean and a loose per-pixel cap
    np.testing.assert_allclose(np.mean(mean), 1.0, atol=0.01)
    np.testing.assert_allclose(mean, 1.0, atol=0.35)


def test_env_is_reduces_variance_on_hot_texel():
    """Importance-sampling a sun-like env must (a) estimate the same image as
    BSDF-only sampling (the below-horizon kill makes both integrate the clamped
    BRDF) and (b) do it with lower error at equal spp — the point of env IS."""
    from tpupt.scene.compile import CompiledScene

    img = np.full((8, 16, 3), 0.05, dtype=np.float32)
    img[2, 5] = 120.0  # dominant sun texel
    compiled_is = _hdr_scene(img).compile()
    compiled_bsdf = CompiledScene(compiled_is.data, has_lights=False)

    cam_ref = _cam(width=8, spp=2048, depth=4)
    _, truth, _ = render_image(compiled_is, cam_ref, rays_per_launch=1 << 16, progress=False)

    cam = _cam(width=8, spp=32, depth=4)
    mses = {}
    for name, c in [("is", compiled_is), ("bsdf", compiled_bsdf)]:
        errs = []
        for seed in range(4):
            _, m, _ = render_image(c, cam, seed=100 + seed, rays_per_launch=1 << 14, progress=False)
            errs.append(np.mean((m - truth) ** 2))
        mses[name] = np.mean(errs)
    # same target, much lower noise with IS
    assert mses["is"] < 0.5 * mses["bsdf"], mses


def test_env_img_grads_flow():
    img = _rand_map()
    s = _hdr_scene(img)
    compiled = s.compile()
    cam = _cam(width=6, spp=4, depth=4)
    radiance, grads = render_grads(compiled, cam, np.arange(8, dtype=np.int32), spp=4)
    g = grads["env_img"]
    assert g.shape == compiled.data.env_img.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0.0


def test_env_is_unbiased_with_occluder():
    """VERDICT round-1 item 10: the below-horizon kill (render/integrator.py,
    env NEE samples aimed under an opaque lane's shading horizon are treated as
    failed samples) is an estimator deviation — verify it introduces no
    measurable bias when geometry actually occludes part of the environment.

    Setup: uniform env of 1 + two touching white Lambertian spheres (the second
    occludes a chunk of the first's sky and creates inter-reflection, i.e. a
    non-convex arrangement). The env-IS estimator (env as MIS light member) and
    the BSDF-only estimator (has_lights=False) integrate the same clamped BRDF,
    so their converged images must agree.
    """
    from tpupt.scene.compile import CompiledScene

    img = np.ones((8, 16, 3), dtype=np.float32)
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((1.0, 1.0, 1.0)))
    s.add_sphere(1.0, (1.6, 0.0, -3.0), Diffuse((1.0, 1.0, 1.0)))  # occluder
    s.environment = ImageTexture(img, hdr=True)
    compiled_is = s.compile()
    assert compiled_is.data.env_is_hdr and compiled_is.has_lights
    compiled_bsdf = CompiledScene(compiled_is.data, has_lights=False)

    cam = _cam(width=12, spp=512, depth=8)
    _, m_is, _ = render_image(compiled_is, cam, rays_per_launch=1 << 15, progress=False)
    _, m_bsdf, _ = render_image(compiled_bsdf, cam, seed=7, rays_per_launch=1 << 15, progress=False)

    # both unbiased for the same integrand: agreement within Monte-Carlo noise
    diff = np.abs(m_is.mean(axis=-1) - m_bsdf.mean(axis=-1))
    assert np.abs(m_is.mean() - m_bsdf.mean()) < 0.01, (m_is.mean(), m_bsdf.mean())
    assert np.percentile(diff, 95) < 0.06, np.percentile(diff, 95)
    # and the furnace identity holds for the IS estimator specifically
    np.testing.assert_allclose(m_is.mean(), 1.0, atol=0.02)

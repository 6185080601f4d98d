"""Differentiable-pass checks: detached-sampling gradients vs finite differences.

The reference renderer has no backward pass; gradients are a new-design capability
(BASELINE.json: "pixel-grad max-err vs finite differences"). The estimator is seeded
and counter-based, so for parameters that do NOT alter the sampling distributions
(albedo, emission, env color) the seeded estimate is a smooth closed-form function of
the parameter and central finite differences of the *same seed* must match the
detached gradient almost exactly. For parameters that do steer sampling (roughness),
the detached gradient equals the FD of the *expected* image only — checked
statistically at high spp.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpupt.render.camera import Camera
from tpupt.render.diff import init_params, make_pixel_fn, render_grads, trace_radiance_scan
from tpupt.render.integrator import trace_radiance
from tpupt.scene.builder import Diffuse, Light, Metal, Scene
from tpupt.scene.data import MAT_LIGHT, P_ROUGHNESS


def _cam(width=8, depth=4):
    return Camera(
        aspect_ratio=1.0, image_width=width, samples_per_pixel=4, max_depth=depth,
        vfov=40.0, look_from=(0.0, 1.0, 3.0), look_at=(0.0, 1.0, 0.0),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )


def _box_scene(albedo=(0.73, 0.6, 0.5), emit=(6.0, 5.0, 4.0)):
    """Diffuse floor + sphere + quad area light overhead; env black."""
    s = Scene()
    floor = Diffuse(albedo)
    s.add_quad((-4.0, 0.0, -4.0), (8.0, 0.0, 0.0), (0.0, 0.0, 8.0), floor)
    s.add_sphere(0.7, (0.0, 0.7, 0.0), floor)
    s.add_quad((-1.0, 3.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light(emit), light=True)
    s.environment = (0.0, 0.0, 0.0)
    return s


def _pixels(compiled, camera, spp):
    w = camera.image_width
    npix = w * camera.image_height
    pix = np.repeat(np.arange(npix, dtype=np.int32), spp)
    samp = np.tile(np.arange(spp, dtype=np.int32), npix)
    return jnp.asarray(pix), jnp.asarray(pix // w), jnp.asarray(pix % w), jnp.asarray(samp)


def test_scan_matches_while_forward():
    """The scan (differentiable) integrator must reproduce the while-loop wavefront
    in the forward direction — same estimator, same RNG stream. (Tolerance is float32
    re-association noise: the two programs fuse differently under XLA.)"""
    s = _box_scene()
    cam = _cam(width=8, depth=12)
    compiled = s.compile()
    c = cam.init()
    pix, rows, cols, samp = _pixels(compiled, cam, spp=2)
    seed = jnp.uint32(3)

    r_while, _ = jax.jit(
        lambda: trace_radiance(compiled.data, c, pix, rows, cols, samp, seed, 12, True)
    )()
    r_scan = jax.jit(
        lambda: trace_radiance_scan(
            compiled.data, c, pix, rows, cols, samp, seed, 12, True
        )
    )()
    np.testing.assert_allclose(
        np.asarray(r_while), np.asarray(r_scan), rtol=1e-4, atol=1e-5
    )


def _fd_check(scene_fn, param_path, h, rtol, atol=1e-4, depth=4, spp=4, width=6):
    """Central-difference check of d(sum image)/d(theta) for a scalar coordinate.

    param_path: (field, index_tuple) into the DIFF_FIELDS pytree.
    """
    cam = _cam(width=width, depth=depth)
    compiled = scene_fn().compile()
    fn = make_pixel_fn(compiled, cam)
    pix, rows, cols, samp = _pixels(compiled, cam, spp)
    args = (pix, rows, cols, samp, jnp.uint32(0))
    params = init_params(compiled.data)
    field, idx = param_path

    loss = jax.jit(lambda p: fn(p, *args).sum())
    g = jax.jit(jax.grad(loss))(params)[field][idx]

    def at(v):
        p = dict(params)
        p[field] = params[field].at[idx].set(v)
        return float(loss(p))

    v0 = float(params[field][idx])
    fd = (at(v0 + h) - at(v0 - h)) / (2.0 * h)
    np.testing.assert_allclose(float(g), fd, rtol=rtol, atol=atol)
    return float(g), fd


def _light_tex(compiled):
    mt = np.asarray(compiled.data.mat_type)
    (light_ids,) = np.nonzero(mt == MAT_LIGHT)
    return int(np.asarray(compiled.data.mat_tex)[light_ids[0]])


def test_grad_emission_linear():
    """Radiance is linear in light emission -> FD matches the gradient exactly."""
    cam = _cam()
    compiled = _box_scene().compile()
    tex = _light_tex(compiled)
    g, fd = _fd_check(_box_scene, ("tex_rgb", (tex, 1)), h=0.5, rtol=1e-3)
    assert g > 0.0  # brighter light -> brighter image


def test_grad_albedo_polynomial():
    """Cosine sampling does not depend on albedo; at depth<=4 the seeded estimate is
    a low-degree polynomial in albedo and central FD matches closely."""
    g, fd = _fd_check(_box_scene, ("tex_rgb", (0, 0)), h=5e-3, rtol=2e-2)
    assert g > 0.0


def test_grad_env_color_linear():
    def scene():
        s = _box_scene()
        s.environment = (0.4, 0.5, 0.6)
        return s

    _fd_check(scene, ("env_color", (2,)), h=0.1, rtol=1e-3)


def test_grad_zero_for_absent_channel():
    """A black pixel block (light off) has zero gradient w.r.t. albedo."""
    cam = _cam()
    compiled = _box_scene(emit=(0.0, 0.0, 0.0)).compile()
    pixel_ids = np.arange(4, dtype=np.int32)
    radiance, grads = render_grads(compiled, cam, pixel_ids, spp=2, seed=0)
    assert float(jnp.abs(grads["tex_rgb"][0]).sum()) == 0.0
    assert np.asarray(radiance).max() == 0.0


@pytest.mark.slow
def test_grad_roughness_statistical():
    """Roughness steers VNDF sampling, so the detached gradient only equals the FD
    of the expected image: compare at moderate spp with a loose tolerance."""

    def scene():
        s = Scene()
        s.add_quad((-4.0, 0.0, -4.0), (8.0, 0.0, 0.0), (0.0, 0.0, 8.0), Metal((0.9, 0.9, 0.9), 0.4))
        s.add_quad((-1.0, 3.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((5.0, 5.0, 5.0)), light=True)
        s.environment = (0.1, 0.1, 0.1)
        return s

    cam = _cam(width=6, depth=3)
    compiled = scene().compile()
    fn = make_pixel_fn(compiled, cam)
    pix, rows, cols, samp = _pixels(compiled, cam, spp=256)
    args = (pix, rows, cols, samp, jnp.uint32(0))
    params = init_params(compiled.data)

    mt = np.asarray(compiled.data.mat_type)
    metal_id = int(np.nonzero(mt != MAT_LIGHT)[0][0])
    idx = (metal_id, P_ROUGHNESS)

    loss = jax.jit(lambda p: fn(p, *args).sum())
    g = float(jax.jit(jax.grad(loss))(params)["mat_params"][idx])

    h = 0.05
    v0 = float(params["mat_params"][idx])

    def at(v):
        p = dict(params)
        p["mat_params"] = params["mat_params"].at[idx].set(v)
        return float(loss(p))

    fd = (at(v0 + h) - at(v0 - h)) / (2.0 * h)
    # detached grad estimates d E[image]; FD of one seed at 256 spp is itself noisy
    assert np.sign(g) == np.sign(fd)
    np.testing.assert_allclose(g, fd, rtol=0.5)


EARTH = "/root/reference/assets/earthmap.jpg"
BRICKS_NORMAL = "/root/reference/assets/bricks/normal.png"


@pytest.mark.slow
def test_grad_normal_map_texel():
    """VERDICT round-2 item 7: gradients flow through normal-map texels.

    The north star names gradients w.r.t. "texture and normal maps". A mapped
    normal is decoded from the atlas (2*texel-1), pushed through the ad-hoc TBN
    basis (hit_info.rs:58-67 parity, ops/intersect.py _select_hit) into the
    shading normal, which enters bsdf_eval's cos(theta) term. The texel is a
    differentiable atlas leaf, so AD must reach it through the TBN math.

    The shading normal ALSO steers the cosine-hemisphere sampling frame (which
    detached-sampling stop_gradients), so — like roughness — the detached
    gradient equals the FD of the EXPECTED image, not of one seed: checked
    statistically at moderate spp, plus sign agreement.
    """
    from tpupt.scene.builder import ImageTexture

    def scene():
        s = Scene()
        # floor with bricks normal map + SOLID albedo: every atlas texel is a
        # normal-map texel, so any nonzero atlas gradient proves the TBN path
        s.add_quad(
            (-4.0, 0.0, -4.0), (8.0, 0.0, 0.0), (0.0, 0.0, 8.0),
            Diffuse((0.7, 0.6, 0.5), normal_map=ImageTexture(BRICKS_NORMAL)),
        )
        s.add_quad((-1.0, 3.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0),
                   Light((6.0, 6.0, 6.0)), light=True)
        s.environment = (0.0, 0.0, 0.0)
        return s

    cam = _cam(width=6, depth=3)
    compiled = scene().compile()
    assert compiled.data.has_normal_maps
    fn = make_pixel_fn(compiled, cam)
    pix, rows, cols, samp = _pixels(compiled, cam, spp=64)
    params = init_params(compiled.data)

    # (a) per-texel: gradients reach individual normal-map texels and the most
    # influential one FD-agrees in sign (a single texel is touched by only a
    # handful of (pixel,sample) pairs under the nearest lookup, so its one-seed
    # FD is too noisy for a magnitude check — see (b) for that)
    def loss_seed(p, seed):
        return fn(p, pix, rows, cols, samp, seed).sum()

    loss_j = jax.jit(loss_seed)
    grad_j = jax.jit(jax.grad(loss_seed))
    g = np.asarray(grad_j(params, jnp.uint32(0))["atlas"])
    assert (g != 0).any(), "no gradient reached the normal-map texels"
    ti = int(np.abs(g[:, 2]).argmax())
    assert g[ti, 2] != 0.0

    # (b) magnitude, statistically: a scalar shift of the WHOLE z (blue) channel
    # touches every shading point every seed, so AD and central FD means over
    # seeds both estimate d E[image]/d shift and must agree (measured:
    # AD 588.9 +- 12.5 vs FD 627.5 +- 19.3 over 10 seeds at 128 spp)
    def loss_shift(alpha, seed):
        p = dict(params)
        p["atlas"] = params["atlas"].at[:, 2].add(alpha)
        return fn(p, pix, rows, cols, samp, seed).sum()

    shift_j = jax.jit(loss_shift)
    shift_g = jax.jit(jax.grad(loss_shift))
    h = 0.05
    ads, fds = [], []
    for seed in range(4):
        sd = jnp.uint32(seed)
        ads.append(float(shift_g(0.0, sd)))
        fds.append((float(shift_j(h, sd)) - float(shift_j(-h, sd))) / (2.0 * h))
    ad, fd = np.mean(ads), np.mean(fds)
    assert ad > 0.0 and fd > 0.0, (ads, fds)
    np.testing.assert_allclose(ad, fd, rtol=0.25)


def test_grad_image_texture_texel():
    """VERDICT round-1 item 5: image-texture texels are differentiable leaves.

    The atlas stores u8-quantized values in f32 (texture.rs:63-68 parity); the
    nearest-texel gather's scatter-add adjoint yields per-texel gradients.
    Radiance is linear in the hit texel's albedo at depth 1ish, so central FD
    must match tightly at the texel AD says matters most.
    """
    from tpupt.scene.builder import ImageTexture

    def scene():
        s = Scene()
        s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse(ImageTexture(EARTH)))
        s.environment = (1.0, 1.0, 1.0)
        return s

    cam = _cam(width=6, depth=3)
    compiled = scene().compile()
    fn = make_pixel_fn(compiled, cam)
    pix, rows, cols, samp = _pixels(compiled, cam, spp=4)
    args = (pix, rows, cols, samp, jnp.uint32(0))
    params = init_params(compiled.data)

    loss = jax.jit(lambda p: fn(p, *args).sum())
    grads = jax.jit(jax.grad(loss))(params)["atlas"]
    g = np.asarray(grads)
    assert (g != 0).any(), "no gradient reached the atlas"
    # the most influential texel, red channel
    ti = int(np.abs(g[:, 0]).argmax())
    g_ad = float(g[ti, 0])

    h = 0.25
    def at(v):
        p = dict(params)
        p["atlas"] = params["atlas"].at[ti, 0].set(v)
        return float(loss(p))

    v0 = float(params["atlas"][ti, 0])
    fd = (at(v0 + h) - at(v0 - h)) / (2.0 * h)
    np.testing.assert_allclose(g_ad, fd, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_film_grads_match_render_grads():
    """Round 5 (VERDICT round-4 item 1): the path-regeneration differentiable
    scan (trace_film_scan / render_film_grads — the `grads` bench path) must
    reproduce the masked per-sample scan's radiance, traced-ray count, and
    gradients exactly: same estimator, same RNG stream, different scheduling
    (lanes stream k samples with regeneration instead of one (pixel,sample)
    lane per path)."""
    from tpupt.render.diff import render_film_grads, render_grads
    from tpupt.scenes import cornell_box_scene

    scene, cam = cornell_box_scene(16, 8)
    cam.max_depth = 12
    compiled = scene.compile()
    ids = np.arange(cam.image_width * cam.image_height, dtype=np.int32)

    rad1, g1, rays1 = render_grads(compiled, cam, ids, spp=8, seed=0, return_stats=True)
    mean2, g2, rays2 = render_film_grads(compiled, cam, spp=8, seed=0, return_stats=True)

    assert rays1 == rays2  # every (pixel, sample) path traced exactly once
    np.testing.assert_allclose(
        np.asarray(mean2).reshape(-1, 3), np.asarray(rad1), rtol=1e-5, atol=1e-6
    )
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g2[k]), np.asarray(g1[k]), rtol=2e-4, atol=1e-5
        )
    assert float(np.abs(np.asarray(g1["mat_params"])).sum()) > 0.0

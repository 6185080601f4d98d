"""Path-regeneration wavefront == per-path integrator (identical estimator)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.render.camera import Camera
from tpupt.render.integrator import trace_film_streamed, trace_radiance
from tpupt.scene.builder import Diffuse, Glass, Light, Metal, Principled, Scene


def _scene():
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -4.0), Diffuse((0.6, 0.5, 0.4)))
    s.add_sphere(0.7, (1.5, 0.0, -3.0), Metal((0.9, 0.8, 0.7), 0.2))
    s.add_sphere(0.7, (-1.5, 0.0, -3.0), Glass.basic(1.5))
    s.add_sphere(0.5, (0.0, 1.5, -3.0), Principled((0.7, 0.2, 0.2), roughness=0.4, metallic=0.5))
    s.add_quad(
        (-1.0, 2.5, -4.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((6.0, 6.0, 6.0)), light=True
    )
    s.environment = (0.2, 0.3, 0.4)
    cam = Camera(
        aspect_ratio=1.0, image_width=12, samples_per_pixel=8, max_depth=12,
        vfov=45.0, look_from=(0, 0, 1), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=4.0, defocus_angle=0.5,
    )
    return s, cam


def test_streamed_equals_per_path():
    s, cam = _scene()
    compiled = s.compile()
    sd = compiled.data
    cd = cam.init()
    npix = cam.image_width * cam.image_height
    spp = cam.samples_per_pixel
    ids = jnp.arange(npix, dtype=jnp.int32)
    rows, cols = ids // cam.image_width, ids % cam.image_width

    # per-path: all (pixel, sample) lanes at once
    pix_all = jnp.tile(ids, spp)
    rows_all = jnp.tile(rows, spp)
    cols_all = jnp.tile(cols, spp)
    samp_all = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
    f_pp = jax.jit(trace_radiance, static_argnums=(7, 8))
    radiance, rays_pp = f_pp(sd, cd, pix_all, rows_all, cols_all, samp_all, jnp.uint32(0), 12, True)
    film_pp = np.asarray(radiance).reshape(spp, npix, 3).sum(axis=0)

    # streamed: one lane per pixel, k = spp
    f_st = jax.jit(trace_film_streamed, static_argnums=(8, 9, 10))
    film_st, rays_st = f_st(
        sd, cd, ids, rows, cols, jnp.int32(0), jnp.int32(spp), jnp.uint32(0), spp, 12, True
    )

    np.testing.assert_allclose(np.asarray(film_st), film_pp, rtol=2e-4, atol=2e-5)
    # same set of paths traced -> identical ray count
    assert int(rays_pp) == int(rays_st), (int(rays_pp), int(rays_st))


def test_streamed_respects_spp_limit():
    """k larger than the remaining sample budget must not add extra samples."""
    s, cam = _scene()
    compiled = s.compile()
    sd = compiled.data
    cd = cam.init()
    npix = cam.image_width * cam.image_height
    ids = jnp.arange(npix, dtype=jnp.int32)
    rows, cols = ids // cam.image_width, ids % cam.image_width
    f_st = jax.jit(trace_film_streamed, static_argnums=(8, 9, 10))
    # chunk [4, 8) with k=8 but spp_limit=6 -> only samples 4,5
    film_a, _ = f_st(sd, cd, ids, rows, cols, jnp.int32(4), jnp.int32(6), jnp.uint32(0), 8, 12, True)
    film_b, _ = f_st(sd, cd, ids, rows, cols, jnp.int32(4), jnp.int32(6), jnp.uint32(0), 2, 12, True)
    np.testing.assert_allclose(np.asarray(film_a), np.asarray(film_b), rtol=2e-4, atol=2e-5)


def test_padded_final_pixel_block_matches_single_launch():
    """npix not divisible by the launch block: the padded lanes of the final
    block must contribute nothing (they are deactivated via sample0 >= spp_limit
    — they used to re-render pixel 0 at full cost) and the film must equal the
    single-launch render exactly."""
    from tpupt.render.camera import Camera
    from tpupt.render.renderer import render_image
    from tpupt.scene.builder import Diffuse, Light, Scene

    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((0.6, 0.5, 0.4)))
    s.add_sphere(0.4, (1.5, 1.5, -2.5), Light((5.0, 5.0, 5.0)), light=True)
    s.environment = (0.2, 0.3, 0.4)
    compiled = s.compile()
    cam = Camera(
        aspect_ratio=1.0, image_width=20, samples_per_pixel=8, max_depth=5,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )
    # 400 pixels; block size 256 -> second block is 56% padding
    _, m_blocks, st_b = render_image(compiled, cam, rays_per_launch=256, progress=False)
    _, m_single, st_s = render_image(compiled, cam, rays_per_launch=1 << 14, progress=False)
    np.testing.assert_allclose(m_blocks, m_single, rtol=1e-6, atol=1e-7)
    assert st_b.launches > st_s.launches

"""SPMD sharding on the 8-device virtual CPU mesh (standard pod-free JAX testing)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.parallel.sharding import make_mesh, render_block_sharded
from tpupt.render.camera import Camera
from tpupt.scene.builder import Diffuse, Light, Scene


def _tiny_scene():
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((0.6, 0.5, 0.4)))
    s.add_quad(
        (-1.0, 2.5, -4.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((6.0, 6.0, 6.0)), light=True
    )
    s.environment = (0.2, 0.3, 0.4)
    cam = Camera(
        aspect_ratio=1.0, image_width=8, samples_per_pixel=16, max_depth=6,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )
    return s, cam


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device():
    """Sample-sharded render == unsharded render, bit-for-bit per the counter RNG."""
    s, cam = _tiny_scene()
    compiled = s.compile()
    npix = 64
    ids = np.arange(npix, dtype=np.int32)
    rows, cols = ids // 8, ids % 8

    mesh8 = make_mesh(8)
    film8, rays8 = render_block_sharded(compiled, cam, ids, rows, cols, spp=16, mesh=mesh8)

    mesh1 = make_mesh(1)
    film1, rays1 = render_block_sharded(compiled, cam, ids, rows, cols, spp=16, mesh=mesh1)

    np.testing.assert_allclose(np.asarray(film8), np.asarray(film1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(rays8), float(rays1))


def test_sharded_matches_renderer():
    """Sharded film equals the host-chunked renderer path."""
    from tpupt.render.renderer import render_image

    s, cam = _tiny_scene()
    compiled = s.compile()
    npix = cam.image_width * cam.image_height
    ids = np.arange(npix, dtype=np.int32)
    film, _ = render_block_sharded(
        compiled, cam, ids, ids // cam.image_width, ids % cam.image_width, spp=16
    )
    mean_sharded = np.asarray(film).reshape(cam.image_height, cam.image_width, 3) / 16.0

    _, mean_host, _ = render_image(compiled, cam, rays_per_launch=1 << 12, progress=False)
    np.testing.assert_allclose(mean_sharded, mean_host, rtol=1e-5, atol=1e-6)


def test_sharded_grads_match_single_device():
    """Backward pass under shard_map: grads all-reduced over the mesh must match the
    single-device detached-sampling gradients."""
    import jax
    from tpupt.parallel.sharding import make_mesh, render_grads_sharded
    from tpupt.render.diff import render_grads

    from tpupt.scenes import cornell_box_scene

    scene, cam = cornell_box_scene(8, 8)
    cam.max_depth = 6
    compiled = scene.compile()
    ids = np.arange(16, dtype=np.int32)
    rows, cols = ids // 8, ids % 8

    film8, g8 = render_grads_sharded(compiled, cam, ids, rows, cols, spp=8, mesh=make_mesh(8))
    radiance, g1 = render_grads(compiled, cam, ids, spp=8, seed=0)

    np.testing.assert_allclose(np.asarray(film8), np.asarray(radiance), rtol=1e-4, atol=1e-5)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g8[k]), np.asarray(g1[k]), rtol=2e-4, atol=1e-5
        )
    assert float(jnp.abs(g1["mat_params"]).sum()) > 0.0

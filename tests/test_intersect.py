"""Intersection kernels vs closed-form cases (sphere.rs / quad.rs / mesh.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.ops import intersect as ix

_closest = jax.jit(ix.closest_hit, static_argnums=(4, 5))
from tpupt.scene.builder import Diffuse, Scene


def _compile(scene):
    return scene.compile().data


def _single_ray(o, d, t=0.0):
    return (
        jnp.asarray([o], jnp.float32),
        jnp.asarray([d], jnp.float32),
        jnp.asarray([t], jnp.float32),
    )


def test_sphere_hit_distance_and_normal():
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -5.0), Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0, 0, 0], [0, 0, -1])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.ng[0]), [0, 0, 1], atol=1e-5)
    assert bool(hit.front[0])


def test_sphere_inside_hit_backface():
    s = Scene()
    s.add_sphere(2.0, (0.0, 0.0, 0.0), Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0, 0, 0], [1, 0, 0])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)
    # inside: geometric normal flipped toward the ray origin (hit_info.rs:25-30)
    np.testing.assert_allclose(np.asarray(hit.ng[0]), [-1, 0, 0], atol=1e-5)
    assert not bool(hit.front[0])


def test_moving_sphere_lerps_center():
    """sphere.rs:58-60: center = c1 + (c2-c1)*time."""
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -5.0), Diffuse((1, 1, 1)), center2=(0.0, 4.0, -5.0))
    sd = _compile(s)
    o = jnp.asarray([[0, 0, 0], [0, 0, 0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    t = jnp.asarray([0.0, 1.0], jnp.float32)
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert bool(hit.valid[0])  # at time 0 the sphere is on-axis
    assert not bool(hit.valid[1])  # at time 1 it moved up by 4


def test_sphere_uv_poles_and_seam():
    """sphere.rs:52-56: u from atan2(-z, x)+pi, v from acos(-y)."""
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, 0.0), Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0, 5, 0], [0, -1, 0])  # hits north pole (y=+1)
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    np.testing.assert_allclose(float(hit.v[0]), 1.0, atol=1e-4)
    o, d, t = _single_ray([5, 0, 0], [-1, 0, 0])  # hits +x: phi=atan2(0,1)+pi=pi
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    np.testing.assert_allclose(float(hit.u[0]), 0.5, atol=1e-4)
    np.testing.assert_allclose(float(hit.v[0]), 0.5, atol=1e-4)


def test_quad_hit_uv_and_miss():
    s = Scene()
    s.add_quad((0.0, 0.0, -3.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0), Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0.5, 1.5, 0.0], [0, 0, -1])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(float(hit.u[0]), 0.25, atol=1e-5)  # alpha
    np.testing.assert_allclose(float(hit.v[0]), 0.75, atol=1e-5)  # beta
    o, d, t = _single_ray([2.5, 0.5, 0.0], [0, 0, -1])  # outside [0,1]^2
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert not bool(hit.valid[0])


def test_quad_parallel_ray_misses():
    s = Scene()
    s.add_quad((0.0, 0.0, -3.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0), Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0, 0, 0], [1, 0, 0])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert not bool(hit.valid[0])


def test_triangle_hit_barycentric_uv():
    s = Scene()
    obj = {
        "positions": np.asarray([[0, 0, -2], [1, 0, -2], [0, 1, -2]], np.float32),
        "normals": None,
        "uvs": None,
        "indices": np.asarray([[0, 1, 2]], np.int32),
    }
    s.add_mesh(obj, Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0.25, 0.25, 0.0], [0, 0, -1])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)
    # no UVs -> barycentric (u, v) (mesh.rs:100)
    np.testing.assert_allclose(float(hit.u[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(hit.v[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.ng[0]), [0, 0, 1], atol=1e-5)
    o, d, t = _single_ray([0.75, 0.75, 0.0], [0, 0, -1])  # u+v > 1
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert not bool(hit.valid[0])


def test_triangle_interpolates_vertex_normals():
    s = Scene()
    n0 = [0, 0, 1]
    n1 = [1, 0, 0]
    n2 = [0, 1, 0]
    obj = {
        "positions": np.asarray([[0, 0, -2], [1, 0, -2], [0, 1, -2]], np.float32),
        "normals": np.asarray([n0, n1, n2], np.float32),
        "uvs": None,
        "indices": np.asarray([[0, 1, 2]], np.int32),
    }
    s.add_mesh(obj, Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0.2, 0.3, 0.0], [0, 0, -1])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    expect = 0.5 * np.asarray(n0) + 0.2 * np.asarray(n1) + 0.3 * np.asarray(n2)
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(np.asarray(hit.ng[0]), expect, atol=1e-5)


def test_closest_of_overlapping_prims():
    s = Scene()
    s.add_sphere(0.5, (0.0, 0.0, -4.0), Diffuse((1, 0, 0)))
    s.add_quad((-1.0, -1.0, -2.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0), Diffuse((0, 1, 0)))
    sd = _compile(s)
    o, d, t = _single_ray([0, 0, 0], [0, 0, -1])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)  # quad is closer


def test_tmin_respected():
    """camera.rs:179: hits at t <= 1e-3 rejected (self-intersection epsilon)."""
    s = Scene()
    s.add_quad((-1.0, -1.0, 0.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0), Diffuse((1, 1, 1)))
    sd = _compile(s)
    o, d, t = _single_ray([0, 0, 0.0005], [0, 0, -1])
    hit = _closest(sd, o, d, t, 1e-3, float(ix.BIG))
    assert not bool(hit.valid[0])


def test_baked_instance_matches_reference_transform():
    """Cuboid under rotate+translate: baked quads equal instance.rs math."""
    from tpupt.scene.builder import Transform

    s = Scene()
    tr = Transform((0.0, 1.0, 0.0), 0.5, (1.0, 0.0, 2.0))
    s.add_cuboid((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), Diffuse((1, 1, 1)), transform=tr)
    sd = _compile(s)
    assert sd.quad_q.shape[0] == 8  # 6 faces padded to the sweep block multiple
    # a point at local cuboid corner (0,0,1) -> rotate 0.5 about y then translate
    c, si = np.cos(0.5), np.sin(0.5)
    expect = np.asarray([si * 1.0 + 1.0, 0.0, c * 1.0 + 2.0])
    np.testing.assert_allclose(np.asarray(sd.quad_q[0]), expect, atol=1e-5)


def test_sphere_transform_instance():
    """Round 5 (VERDICT round-4 stretch): add_sphere accepts a Transform like
    every other geometry entry (instance.rs:20-30 wraps ANY Hittable). A
    rotate+translate instance of a sphere must render identically to the
    sphere placed at the transformed center directly."""
    import numpy as np

    from tpupt.render.camera import Camera
    from tpupt.render.renderer import render_image
    from tpupt.scene.builder import Diffuse, Scene, Transform

    tr = Transform(axis=(0.0, 0.0, 1.0), angle=1.1, translation=(0.5, -0.2, -1.0))
    c = np.array([0.6, 0.4, -3.0])
    c_moved = tr.apply_point(c)

    def render(center, transform=None):
        s = Scene()
        s.add_sphere(0.8, tuple(center), Diffuse((0.6, 0.5, 0.4)), transform=transform)
        s.environment = (0.7, 0.8, 1.0)
        cam = Camera(
            aspect_ratio=1.0, image_width=16, samples_per_pixel=4, max_depth=4,
            vfov=40.0, look_from=(0, 0, 1), look_at=(0, 0, -1),
            blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
        )
        _, mean, _ = render_image(s.compile(), cam, progress=False)
        return np.asarray(mean)

    np.testing.assert_array_equal(render(c, transform=tr), render(c_moved))

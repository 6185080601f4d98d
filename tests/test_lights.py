"""Light sampling / pdf (list.rs:78-96, quad.rs:80-98, sphere.rs:110-135)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.ops import lights as L

_pdf_lights = jax.jit(L.pdf_lights)
_sample_lights = jax.jit(lambda *a: L.sample_lights(*a)[0])  # drop is_env flag
from tpupt.scene.builder import Diffuse, Light, Scene


def _uniform_sphere(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def _quad_scene():
    s = Scene()
    s.add_sphere(1.0, (100.0, 0.0, 0.0), Diffuse((1, 1, 1)))  # unrelated object
    s.add_quad(
        (-1.0, 3.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((5, 5, 5)), light=True
    )
    return s.compile()


def test_quad_light_pdf_integrates_to_one():
    """pdf = d^2/(cos*area) is the solid-angle density of uniform area sampling."""
    sc = _quad_scene()
    n = 2_000_000
    dirs = _uniform_sphere(n, 1)
    origin = jnp.zeros((n, 3), jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    pdf = np.asarray(_pdf_lights(sc.data, origin, jnp.asarray(dirs), time))
    integral = pdf.mean() * 4.0 * np.pi
    np.testing.assert_allclose(integral, 1.0, rtol=0.03)


def test_quad_light_sample_directions_hit_quad():
    sc = _quad_scene()
    n = 10_000
    r = np.random.default_rng(2)
    origin = jnp.zeros((n, 3), jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    dirs = np.asarray(
        _sample_lights(
            sc.data,
            origin,
            time,
            jnp.asarray(r.random(n), jnp.float32),
            jnp.asarray(r.random(n), jnp.float32),
            jnp.asarray(r.random(n), jnp.float32),
        )
    )
    # every sampled direction re-intersects the light -> pdf > 0
    pdf = np.asarray(_pdf_lights(sc.data, origin, jnp.asarray(dirs), time))
    assert (pdf > 0).all()
    # directions point up toward the y=3 plane
    assert (dirs[:, 1] > 0).all()


def test_sphere_light_pdf_formula():
    """Reference formula: 1 / (2*pi*sqrt(1 - r^2/d^2)) — sphere.rs:128-131 verbatim."""
    s = Scene()
    s.add_sphere(100.0, (0.0, 0.0, 0.0), Diffuse((1, 1, 1)))  # dummy object far away? no: at origin
    s = Scene()
    s.add_sphere(0.1, (100.0, 0.0, 0.0), Diffuse((1, 1, 1)))
    s.add_sphere(1.0, (0.0, 5.0, 0.0), Light((1, 1, 1)), light=True)
    sc = s.compile()
    origin = jnp.zeros((1, 3), jnp.float32)
    time = jnp.zeros((1,), jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    pdf = float(_pdf_lights(sc.data, origin, d, time)[0])
    expect = 1.0 / (2.0 * np.pi * np.sqrt(1.0 - 1.0 / 25.0))
    np.testing.assert_allclose(pdf, expect, rtol=1e-5)
    # direction missing the sphere -> pdf 0
    d2 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    assert float(_pdf_lights(sc.data, origin, d2, time)[0]) == 0.0


def test_mean_over_multiple_lights():
    """list.rs:86-96: pdf is the MEAN over all lights."""
    s = Scene()
    s.add_sphere(0.1, (100.0, 0.0, 0.0), Diffuse((1, 1, 1)))
    s.add_quad((-1.0, 3.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((5, 5, 5)), light=True)
    s.add_quad((-1.0, -9.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((5, 5, 5)), light=True)
    sc = s.compile()
    origin = jnp.zeros((1, 3), jnp.float32)
    time = jnp.zeros((1,), jnp.float32)
    up = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    pdf_up = float(_pdf_lights(sc.data, origin, up, time)[0])
    # only the top light is hit: per-light pdf d^2/(cos*area) = 9/4, mean over 2 lights
    np.testing.assert_allclose(pdf_up, 0.5 * 9.0 / 4.0, rtol=1e-5)


def test_sphere_light_sampling_on_surface():
    s = Scene()
    s.add_sphere(0.1, (100.0, 0.0, 0.0), Diffuse((1, 1, 1)))
    s.add_sphere(2.0, (0.0, 10.0, 0.0), Light((1, 1, 1)), light=True)
    sc = s.compile()
    n = 10_000
    r = np.random.default_rng(4)
    origin = jnp.zeros((n, 3), jnp.float32)
    time = jnp.zeros((n,), jnp.float32)
    dirs = np.asarray(
        _sample_lights(
            sc.data,
            origin,
            time,
            jnp.asarray(r.random(n), jnp.float32),
            jnp.asarray(r.random(n), jnp.float32),
            jnp.asarray(r.random(n), jnp.float32),
        )
    )
    # all directions lie within the cone subtending the sphere (half-angle asin(2/10))
    cos_min = np.cos(np.arcsin(2.0 / 10.0))
    cos_dir = dirs[:, 1]  # dot with (0,1,0)
    assert (cos_dir >= cos_min - 1e-5).all()

"""Pallas fused sphere+quad closest-hit kernel (ops/pallas_hit.py) vs the XLA
sweep oracle — interpret mode on CPU (the kernel itself runs on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.ops.intersect import closest_hit
from tpupt.ops.pallas_hit import pallas_closest_sphere_quad
from tpupt.scenes import cornell_box_scene

import pytest

pytestmark = pytest.mark.slow  # multi-minute lane (pytest.ini)


def _rays(b, seed, lo=0.0, hi=555.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, size=(b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t = rng.uniform(size=b).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(t)


def _check(sd, o, d, time):
    t_p, kind_p, idx_p = pallas_closest_sphere_quad(sd, o, d, time, interpret=True)
    hit = closest_hit(sd, o, d, time, jnp.float32(1e-3), jnp.float32(3.0e38))
    hv = np.asarray(hit.valid)
    tp = np.asarray(t_p)
    np.testing.assert_array_equal(tp < 3.0e38, hv)
    np.testing.assert_allclose(tp[hv], np.asarray(hit.t)[hv], rtol=1e-4)
    # winner material must agree (idx may differ only on exact-t ties)
    sph_mat = np.asarray(sd.sph_mat)
    quad_mat = np.asarray(sd.quad_mat)
    mat_p = np.where(np.asarray(kind_p) == 0, sph_mat[np.asarray(idx_p) % len(sph_mat)],
                     quad_mat[np.asarray(idx_p) % len(quad_mat)])
    assert (mat_p[hv] == np.asarray(hit.mat_id)[hv]).mean() > 0.999


def test_pallas_hit_matches_sweep_cornell():
    sd = cornell_box_scene(64, 4)[0].compile().data
    o, d, time = _rays(1024 + 321, 0)  # deliberately not a multiple of 1024
    _check(sd, o, d, time)


def test_pallas_hit_matches_sweep_moving_spheres():
    """moving spheres exercise the time lerp (interpret mode is slow: keep the
    table small — a trimmed balls scene with a handful of moving spheres)."""
    from tpupt.scene.builder import Diffuse, Light, Scene

    s = Scene()
    for i in range(6):
        c = (float(i) - 3.0, 0.2, 0.0)
        s.add_sphere(0.2, c, Diffuse((0.5, 0.4, 0.3)), center2=(c[0], 0.7, 0.0))
    s.add_quad((-10.0, 0.0, -10.0), (20.0, 0.0, 0.0), (0.0, 0.0, 20.0), Diffuse((0.5, 0.5, 0.5)))
    s.add_quad((-1.0, 5.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((5.0, 5.0, 5.0)), light=True)
    sd = s.compile().data
    o, d, time = _rays(1024, 1, lo=-8.0, hi=8.0)
    _check(sd, o, d, time)


def test_pallas_render_matches_sweep():
    from tpupt.render.renderer import render_image
    from tpupt.scene.compile import CompiledScene

    scene, cam = cornell_box_scene(8, 4)
    compiled = scene.compile()
    _, m_ref, _ = render_image(compiled, cam, rays_per_launch=1 << 14, progress=False)
    pall = CompiledScene(
        dataclasses.replace(compiled.data, use_pallas_hit=True), compiled.has_lights
    )
    _, m_pal, _ = render_image(pall, cam, rays_per_launch=1 << 14, progress=False)
    np.testing.assert_allclose(m_pal, m_ref, rtol=2e-3, atol=1e-4)

"""End-to-end integrator invariants (the reference has no tests; these are physics
oracles per SURVEY.md section 4): white furnace, determinism, emission paths."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpupt.render.camera import Camera
from tpupt.render.renderer import render_image
from tpupt.scene.builder import Diffuse, Light, Scene


def _render(scene, cam, seed=0, rpl=1 << 14):
    compiled = scene.compile()
    img, mean, stats = render_image(compiled, cam, seed=seed, rays_per_launch=rpl, progress=False)
    return img, mean, stats


def test_white_furnace():
    """A white Lambertian sphere in a uniform env of 1 must render to exactly 1.

    Energy conservation through the whole estimator: cosine sampling, pdf, RR
    reweighting, env termination. Any bias in sample/pdf/eval/throughput breaks it.
    """
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((1.0, 1.0, 1.0)))
    s.environment = (1.0, 1.0, 1.0)
    cam = Camera(
        aspect_ratio=1.0,
        image_width=24,
        samples_per_pixel=64,
        max_depth=50,
        vfov=30.0,
        look_from=(0.0, 0.0, 0.0),
        look_at=(0.0, 0.0, -1.0),
        blur_strength=0.5,
        focal_length=3.0,
        defocus_angle=0.0,
    )
    _, mean, _ = _render(s, cam)
    np.testing.assert_allclose(mean, 1.0, atol=0.03)


def test_deterministic_same_seed():
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((0.5, 0.6, 0.7)))
    s.environment = (0.6, 0.7, 0.9)
    cam = Camera(
        aspect_ratio=1.0, image_width=16, samples_per_pixel=8, max_depth=8,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )
    _, m1, _ = _render(s, cam, seed=7)
    _, m2, _ = _render(s, cam, seed=7)
    np.testing.assert_array_equal(m1, m2)
    _, m3, _ = _render(s, cam, seed=8)
    assert not np.allclose(m1, m3)


def test_chunking_invariance():
    """Radiance must not depend on launch chunking (pure counter-based RNG)."""
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((0.5, 0.6, 0.7)))
    s.environment = (0.6, 0.7, 0.9)
    cam = Camera(
        aspect_ratio=1.0, image_width=16, samples_per_pixel=16, max_depth=8,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )
    _, m1, _ = _render(s, cam, rpl=1 << 14)
    _, m2, _ = _render(s, cam, rpl=1 << 9)
    np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-5)


def test_direct_emission():
    """Camera staring at a light quad reads exactly the emission value."""
    s = Scene()
    s.add_quad((-5.0, -5.0, -2.0), (10.0, 0.0, 0.0), (0.0, 10.0, 0.0), Light((3.0, 2.0, 1.0)))
    s.environment = (0.0, 0.0, 0.0)
    cam = Camera(
        aspect_ratio=1.0, image_width=8, samples_per_pixel=32, max_depth=4,
        vfov=20.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.0, focal_length=1.0, defocus_angle=0.0,
    )
    _, mean, _ = _render(s, cam)
    np.testing.assert_allclose(mean, np.asarray([3.0, 2.0, 1.0]) * np.ones((8, 8, 3)), rtol=0.35)
    # hitting an emitter head-on: first-bounce emission is exact; later bounces add
    # light->light MIS continuation noise, hence the loose tolerance. The mean over
    # pixels should be much tighter.
    np.testing.assert_allclose(mean.mean(axis=(0, 1)), [3.0, 2.0, 1.0], rtol=0.1)


def test_env_miss_rays():
    """Rays that miss everything read the constant environment exactly."""
    s = Scene()
    s.add_sphere(0.1, (100.0, 0.0, 0.0), Diffuse((1, 1, 1)))
    s.environment = (0.25, 0.5, 0.75)
    cam = Camera(
        aspect_ratio=1.0, image_width=8, samples_per_pixel=4, max_depth=4,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=1.0, defocus_angle=0.0,
    )
    _, mean, _ = _render(s, cam)
    np.testing.assert_allclose(mean, np.broadcast_to([0.25, 0.5, 0.75], mean.shape), atol=1e-6)


def test_cornell_smoke():
    """Tiny Cornell render: finite, non-black, plausible wall colors."""
    from tpupt.scenes import cornell_box_scene

    s, cam = cornell_box_scene(32, 16)
    _, mean, _ = _render(s, cam)
    assert np.isfinite(mean).all()
    m = mean.mean(axis=(0, 1))
    assert (m > 0.02).all() and (m < 5.0).all()
    # left half (x=555 wall side) greener than right half on average
    left = mean[:, : 16 // 2 + 4].mean(axis=(0, 1))
    right = mean[:, 16 + 4 :].mean(axis=(0, 1))
    assert left[1] / max(left.sum(), 1e-9) > right[1] / max(right.sum(), 1e-9)


def test_gamma_quantize():
    from tpupt.render.film import tonemap_quantize

    x = np.asarray([[[0.25, 1.0, np.nan], [4.0, -1.0, 0.0]]])
    out = tonemap_quantize(x)
    assert out.shape == (1, 2, 3)
    assert out[0, 0, 0] == int(0.5 * 256)  # sqrt(0.25)=0.5
    assert out[0, 0, 1] == int(0.999 * 256)  # clamp at 0.999
    assert out[0, 0, 2] == 0  # NaN -> 0 like Rust `as u8`
    assert out[0, 1, 0] == int(0.999 * 256)
    assert out[0, 1, 1] == 0

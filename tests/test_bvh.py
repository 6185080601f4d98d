"""Stackless triangle BVH (ops/bvh.py): structure invariants + hit-for-hit parity
with the brute-force blocked sweep (the oracle), on a real OBJ mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.io.obj import load_obj
from tpupt.ops.bvh import LEAF_SIZE, build_tri_bvh
from tpupt.ops.intersect import closest_hit
from tpupt.scene.builder import Diffuse, Scene

BUNNY = "/root/reference/assets/bunny.obj"


def _bunny_scene():
    s = Scene()
    s.add_mesh(load_obj(BUNNY), Diffuse((0.7, 0.7, 0.7)), scale=20.0)
    s.environment = (1.0, 1.0, 1.0)
    return s.compile()


def test_bvh_structure():
    rng = np.random.default_rng(0)
    n = 333
    v0 = rng.normal(size=(n, 3)).astype(np.float32)
    e1 = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    e2 = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    order, nodes = build_tri_bvh(v0, e1, e2)
    assert sorted(order.tolist()) == list(range(n))
    m = nodes["bmin"].shape[0]
    # every leaf triangle covered exactly once, in sorted order
    leaf = nodes["count"] > 0
    covered = np.zeros(n, dtype=int)
    for s_, c in zip(nodes["start"][leaf], nodes["count"][leaf]):
        covered[s_ : s_ + c] += 1
        assert 1 <= c <= LEAF_SIZE
    assert (covered == 1).all()
    # skip indices: strictly increasing targets within bounds; root skip == m
    assert nodes["skip"][0] == m
    assert (nodes["skip"] > np.arange(m)).all() and (nodes["skip"] <= m).all()
    # child AABBs inside parents (pre-order: node i+1 is the first child)
    internal = np.nonzero(~leaf)[0]
    for i in internal[:50]:
        assert (nodes["bmin"][i] <= nodes["bmin"][i + 1] + 1e-6).all()
        assert (nodes["bmax"][i] >= nodes["bmax"][i + 1] - 1e-6).all()


def test_bvh_matches_bruteforce_on_bunny():
    compiled = _bunny_scene()
    sd = compiled.data
    assert sd.has_tri_bvh

    # oracle: the same scene data with the BVH flag off -> dense sweep path
    sd_sweep = dataclasses.replace(sd, has_tri_bvh=False)

    rng = np.random.default_rng(1)
    b = 4096
    # rays from a shell around the bunny pointed inward-ish (plus some random)
    o = rng.normal(size=(b, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 8.0
    target = rng.normal(size=(b, 3)).astype(np.float32) * 1.5
    d = target - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)

    o = jnp.asarray(o)
    d = jnp.asarray(d)
    time = jnp.zeros((b,), jnp.float32)
    tmin = jnp.float32(1e-3)
    tmax = jnp.float32(3.0e38)

    hit_bvh = jax.jit(lambda: closest_hit(sd, o, d, time, tmin, tmax))()
    hit_swp = jax.jit(lambda: closest_hit(sd_sweep, o, d, time, tmin, tmax))()

    np.testing.assert_array_equal(np.asarray(hit_bvh.valid), np.asarray(hit_swp.valid))
    hv = np.asarray(hit_bvh.valid)
    assert hv.mean() > 0.1  # the shell rays actually hit the mesh
    np.testing.assert_allclose(
        np.asarray(hit_bvh.t)[hv], np.asarray(hit_swp.t)[hv], rtol=1e-6, atol=1e-6
    )
    # same triangle except exact-tie shared edges (t equal there anyway)
    same = np.asarray(hit_bvh.mat_id) == np.asarray(hit_swp.mat_id)
    assert same.all()
    np.testing.assert_allclose(
        np.asarray(hit_bvh.ng)[hv], np.asarray(hit_swp.ng)[hv], atol=1e-5
    )


def test_bvh_render_matches_sweep():
    """Full integrator parity: same image with and without the BVH."""
    from tpupt.render.camera import Camera
    from tpupt.render.renderer import render_image
    from tpupt.scene.compile import CompiledScene

    compiled = _bunny_scene()
    cam = Camera(
        aspect_ratio=1.0, image_width=12, samples_per_pixel=8, max_depth=6,
        vfov=35.0, look_from=(0.0, 1.0, 6.0), look_at=(0.0, 1.0, 0.0),
        blur_strength=0.5, focal_length=5.0, defocus_angle=0.0,
    )
    _, m_bvh, _ = render_image(compiled, cam, rays_per_launch=1 << 14, progress=False)
    sweep = CompiledScene(
        dataclasses.replace(compiled.data, has_tri_bvh=False), compiled.has_lights
    )
    _, m_swp, _ = render_image(sweep, cam, rays_per_launch=1 << 14, progress=False)
    np.testing.assert_allclose(m_bvh, m_swp, rtol=1e-4, atol=1e-5)


def test_mxu_path_matches_sweep_on_bunny():
    """The MXU matmul intersection (ops/intersect.py _tri_block_mxu) must agree
    with the component sweep (same math, different compute unit)."""
    compiled = _bunny_scene()
    sd_mxu = dataclasses.replace(compiled.data, has_tri_bvh=False, has_tri_mxu=True)
    sd_swp = dataclasses.replace(compiled.data, has_tri_bvh=False, has_tri_mxu=False)

    rng = np.random.default_rng(5)
    b = 4096
    o = rng.normal(size=(b, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 8.0
    d = rng.normal(size=(b, 3)).astype(np.float32) * 1.5 - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    time = jnp.zeros((b,), jnp.float32)

    h_mxu = jax.jit(lambda: closest_hit(sd_mxu, o, d, time, jnp.float32(1e-3), jnp.float32(3e38)))()
    h_swp = jax.jit(lambda: closest_hit(sd_swp, o, d, time, jnp.float32(1e-3), jnp.float32(3e38)))()
    hv = np.asarray(h_swp.valid)
    # valid masks agree except floating-point-borderline hits
    assert (np.asarray(h_mxu.valid) == hv).mean() > 0.999
    both = np.asarray(h_mxu.valid) & hv
    np.testing.assert_allclose(
        np.asarray(h_mxu.t)[both], np.asarray(h_swp.t)[both], rtol=1e-4, atol=1e-4
    )

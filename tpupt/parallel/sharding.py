"""SPMD scaling over a jax.sharding.Mesh.

The reference's only parallelism is rayon work-stealing over pixels on one CPU
(camera.rs:102). The TPU-native design (SURVEY.md section 2.4): shard the *sample* axis
of the ray wavefront over a 1-D device mesh — every device holds a full scene + camera
replica (forward pass needs zero communication), traces its own sample slice for the
same pixel block, and the film is reduced with a `psum` over the mesh (the same
collective that will carry material/texture gradients in the differentiable pass).

This module is exercised two ways:
- tests/test_sharding.py runs it on an 8-device virtual CPU mesh
  (xla_force_host_platform_device_count);
- __graft_entry__.dryrun_multichip jits the full sharded step for N devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

import inspect

# jax 0.9 renamed check_rep -> check_vma; accept either runtime.
_CHECK_KW = (
    "check_vma" if "check_vma" in inspect.signature(_shard_map).parameters else "check_rep"
)


def shard_map(f=None, **kw):
    if "check_rep" in kw:
        kw[_CHECK_KW] = kw.pop("check_rep")
    if f is None:
        return _shard_map(**kw)
    return _shard_map(f, **kw)

from ..core.dtypes import REAL


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only {len(devs)} device(s) "
                "are visible (set XLA_FLAGS=--xla_force_host_platform_device_count and "
                "jax_platforms=cpu before backend init to emulate a pod)"
            )
        devs = devs[:n_devices]
    return Mesh(devs, ("samples",))


def render_block_sharded(
    compiled, camera, pixel_ids, rows, cols, spp: int, seed: int = 0, mesh: Mesh | None = None
):
    """Render one pixel block with the sample axis sharded over the mesh.

    spp must be a multiple of the mesh size. Returns (film_sum [pb,3], rays).

    Round 5 (VERDICT round-4 item 8): this is now a thin block-level entry into
    the ONE production SPMD forward — render/renderer.py _sharded_chunk_film
    (per-device streamed wavefront with regeneration + tail compaction, film
    all-reduced with one psum over the mesh). The earlier separate masked
    trace_radiance step this module carried existed only to be slower and has
    been retired. rows/cols are accepted for signature stability but derived
    from pixel_ids and the camera width inside the streamed path.
    """
    from ..render.renderer import _sharded_chunk_film

    mesh = mesh or make_mesh()
    n = mesh.devices.size
    assert spp % n == 0, f"spp {spp} must divide over {n} devices"
    k = spp // n
    cam = camera.init()
    step = _sharded_chunk_film(
        mesh, k, 1, camera.max_depth, compiled.has_lights, camera.image_width
    )
    pix = jnp.asarray(pixel_ids, jnp.int32)
    film, rays = step(
        compiled.data,
        cam,
        pix,
        jnp.int32(pix.shape[0]),
        jnp.int32(0),
        jnp.int32(spp),
        jnp.uint32(seed),
    )
    return film, rays.astype(REAL)


def sharded_grad_step(mesh: Mesh, max_depth: int, has_lights: bool):
    """Build a jitted SPMD forward+backward step: per-device sample shards, grads
    all-reduced over the mesh.

    This is the backward analog of sharded_sample_step: every device traces its
    own k samples of the pixel block with the detached-sampling segmented
    integrator (render/diff.py segmented_film_vjp) and computes the VJP of its
    shard's film sum w.r.t. the differentiable parameter pytree (mat_params /
    tex_rgb / env_color / env_img / atlas). Parameter gradients are all-reduced
    per BACKWARD SEGMENT (psum_axis="samples" inside the VJP loop): each 8-bounce
    segment's grad chunk rides ICI while the next segment's backward compute
    runs, overlapping communication with the remaining backward wavefront
    (BASELINE.json north star) instead of one serialized psum at the end. The
    reference has no equivalent: its only reduction is rayon's implicit join
    (camera.rs:102).
    """
    from ..render.diff import segmented_film_vjp

    def build(k_per_device: int):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        def sharded(params, sd, cam, pixel_ids, rows, cols, sample0, seed):
            ax = jax.lax.axis_index("samples")
            pb = pixel_ids.shape[0]
            pix = jnp.tile(pixel_ids, k_per_device)
            local_samples = sample0 + ax * k_per_device + jnp.repeat(
                jnp.arange(k_per_device, dtype=jnp.int32), pb
            )
            rr = jnp.tile(rows, k_per_device)
            cc = jnp.tile(cols, k_per_device)

            radiance, grads = segmented_film_vjp(
                params, sd, cam, pix, rr, cc, local_samples, seed, max_depth,
                has_lights, jnp.ones((pix.shape[0], 3), REAL),
                psum_axis="samples",
            )
            film = radiance.reshape(k_per_device, pb, 3).sum(axis=0)
            film = jax.lax.psum(film, "samples")
            return film, grads

        return jax.jit(sharded)

    return build


def render_grads_sharded(
    compiled, camera, pixel_ids, rows, cols, spp: int, seed: int = 0, mesh: Mesh | None = None
):
    """Film sums + parameter grads for a pixel block, sample axis sharded over the mesh.

    Gradient semantics match render_grads with cotangent=ones scaled by spp: returns
    (film_mean [pb,3], grads of d(sum_pixels mean_sample radiance)/d params).
    """
    from ..render.diff import init_params

    mesh = mesh or make_mesh()
    n = mesh.devices.size
    assert spp % n == 0, f"spp {spp} must divide over {n} devices"
    k = spp // n
    cam = camera.init()
    step = sharded_grad_step(mesh, camera.max_depth, compiled.has_lights)(k)
    film, grads = step(
        init_params(compiled.data),
        compiled.data,
        cam,
        jnp.asarray(pixel_ids, jnp.int32),
        jnp.asarray(rows, jnp.int32),
        jnp.asarray(cols, jnp.int32),
        jnp.int32(0),
        jnp.uint32(seed),
    )
    inv = 1.0 / spp
    return film * inv, jax.tree.map(lambda g: g * inv, grads)

"""Host-side render driver: chunks the (pixel, sample) space into fixed-shape launches.

The reference parallelizes over pixels with rayon and loops samples serially per pixel
(camera.rs:102-108). The TPU equivalent: flatten (pixel, sample) into one ray axis,
launch shape-static jitted chunks, and accumulate the film in float32. Chunk shapes are
fixed across launches so XLA compiles the trace kernel exactly once per scene.
"""

from __future__ import annotations

import dataclasses
import time as _time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.compile import CompiledScene
from .camera import Camera
from .film import tonemap_quantize
from .integrator import trace_film_streamed


@dataclasses.dataclass
class RenderStats:
    wall_s: float = 0.0
    paths: int = 0
    rays: int = 0  # actual scene intersections (includes every bounce)
    launches: int = 0

    @property
    def paths_per_s(self) -> float:
        return self.paths / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def rays_per_s(self) -> float:
        return self.rays / self.wall_s if self.wall_s > 0 else 0.0


@partial(jax.jit, static_argnames=("k", "max_depth", "has_lights", "width"))
def _chunk_film(sd, cam, pixel_ids, sample0, spp_limit, seed, *, k, max_depth, has_lights, width):
    """Film sums of up to k samples per pixel in `pixel_ids` -> ([pb,3], rays).

    Uses the path-regeneration wavefront (trace_film_streamed): one lane per pixel,
    each streaming its k samples back-to-back. Samples at or beyond spp_limit are
    never started, so a fixed k never over-counts on the final sample chunk.
    """
    rows = pixel_ids // width
    cols = pixel_ids % width
    return trace_film_streamed(
        sd, cam, pixel_ids, rows, cols, sample0, spp_limit, seed, k, max_depth, has_lights
    )


def render_image(
    compiled: CompiledScene,
    camera: Camera,
    seed: int = 0,
    rays_per_launch: int = 1 << 20,
    samples_per_launch: int = 64,
    progress: bool = True,
):
    """Render -> (uint8 image [H,W,3], float32 mean radiance [H,W,3], RenderStats).

    rays_per_launch bounds the lane count (pixel block size) of a launch;
    samples_per_launch bounds how many samples each lane streams per launch
    (launch granularity for progress/checkpointing, not an estimator knob).
    """
    sd = compiled.data
    cam = camera.init()
    w, h = camera.image_width, camera.image_height
    spp = camera.samples_per_pixel
    npix = w * h

    pb = min(npix, rays_per_launch)
    k = min(spp, samples_per_launch)
    n_pixel_blocks = (npix + pb - 1) // pb
    n_sample_chunks = (spp + k - 1) // k

    film = np.zeros((npix, 3), dtype=np.float64)
    stats = RenderStats()
    t0 = _time.perf_counter()
    seed_u32 = jnp.uint32(seed)

    for pblk in range(n_pixel_blocks):
        lo = pblk * pb
        ids = np.arange(lo, min(lo + pb, npix), dtype=np.int32)
        n_valid = len(ids)
        if n_valid < pb:  # pad final block (padded rows dropped below)
            ids = np.concatenate([ids, np.zeros(pb - n_valid, np.int32)])
        ids_dev = jnp.asarray(ids)
        acc = None
        for schunk in range(n_sample_chunks):
            out, rays = _chunk_film(
                sd,
                cam,
                ids_dev,
                jnp.int32(schunk * k),
                jnp.int32(spp),
                seed_u32,
                k=k,
                max_depth=camera.max_depth,
                has_lights=compiled.has_lights,
                width=w,
            )
            acc = out if acc is None else acc + out
            stats.launches += 1
            stats.paths += n_valid * min(k, spp - schunk * k)
            stats.rays += int(rays)
        film[ids[:n_valid]] += np.asarray(acc)[:n_valid].astype(np.float64)
        if progress:
            print(f"  pixel block {pblk + 1}/{n_pixel_blocks} done", flush=True)

    stats.wall_s = _time.perf_counter() - t0
    mean = (film / spp).reshape(h, w, 3)
    return tonemap_quantize(mean), mean.astype(np.float32), stats

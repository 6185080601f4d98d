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

from ..core.dtypes import NP_REAL
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


@partial(jax.jit, static_argnames=("k", "r", "max_depth", "has_lights", "width"))
def _chunk_film(
    sd, cam, pixel_ids, n_valid, sample0, spp_limit, seed, *, k, r, max_depth,
    has_lights, width
):
    """Film sums of up to r*k samples per pixel in `pixel_ids` -> ([pb,3], rays).

    Uses the path-regeneration wavefront (trace_film_streamed) with r lanes per
    pixel, each streaming its own k-sample slice (replica j takes samples
    [sample0 + j*k, ...)). Replication exists to FILL THE CHIP when the pixel
    block is smaller than the efficient lane count (Cornell 600px = 360k pixels
    vs ~1M lanes; measured +2x). Samples at or beyond spp_limit are never
    started, so fixed (k, r) never over-count on the final sample chunk.

    Lanes past n_valid (the final pixel block's padding) get sample0 >= spp_limit
    so they never start a path: they used to re-render pixel 0 at full cost —
    up to ~30% of all launches' work on FHD configs (2.07M pixels over 1M-lane
    blocks leaves the third block 93% padding); with compaction they now vanish
    at the first occupancy threshold.
    """
    pb = pixel_ids.shape[0]
    pix = jnp.tile(pixel_ids, r)
    rows = pix // width
    cols = pix % width
    lane_sample0 = sample0 + jnp.repeat(jnp.arange(r, dtype=jnp.int32) * k, pb)
    lane_valid = jnp.tile(jnp.arange(pb, dtype=jnp.int32) < n_valid, r)
    lane_sample0 = jnp.where(lane_valid, lane_sample0, spp_limit)
    film, rays = trace_film_streamed(
        sd, cam, pix, rows, cols, lane_sample0, spp_limit, seed, k, max_depth, has_lights
    )
    return film.reshape(r, pb, 3).sum(axis=0), rays


def render_image(
    compiled: CompiledScene,
    camera: Camera,
    seed: int = 0,
    rays_per_launch: int = 1 << 20,
    samples_per_launch: int = 128,
    progress: bool = True,
    checkpoint_path: str | None = None,
    on_launch=None,
    profile_dir: str | None = None,
    debug_checks: bool = False,
):
    """Render -> (uint8 image [H,W,3], float32 mean radiance [H,W,3], RenderStats).

    rays_per_launch bounds the lane count (pixel block size) of a launch;
    samples_per_launch bounds how many samples each lane streams per launch
    (launch granularity for progress/checkpointing, not an estimator knob).

    checkpoint_path: persist (film accumulator, launch cursor, stats) after every
    launch and resume from it when the file exists — the aux subsystem the
    reference lacks (SURVEY.md section 5: single-shot render, camera.rs:118).
    Resuming is exact: the counter-based RNG means a resumed render is
    bit-identical to an uninterrupted one. The config fingerprint (scene shape,
    camera, seed) is verified on load; mismatch raises.

    on_launch(mean_so_far [H,W,3] f32, samples_done_fraction) is called after
    every launch — progressive preview hook.

    profile_dir: wrap the render in a jax.profiler trace (view in XProf /
    TensorBoard) — the observability hook the reference lacks (SURVEY.md
    section 5: one wall-clock dbg! at camera.rs:125).

    debug_checks: validate every launch's film for NaN/Inf and raise with the
    launch coordinates — the JAX-functional analog of the reference's
    glam-assert debug feature (Cargo.toml:8). Costs one host sync per launch.
    """
    sd = compiled.data
    cam = camera.init()
    w, h = camera.image_width, camera.image_height
    spp = camera.samples_per_pixel
    npix = w * h

    pb = min(npix, rays_per_launch)
    # schedule (measured on Cornell 600px/100spp, v5 lite):
    # - ~256k lanes already saturate the chip; more lanes only lengthen the
    #   wavefront tail (360k/r=1/k=100 -> 83.8M rays/s beats 1.8M/r=5/k=20 -> 74M)
    # - the longest possible per-lane sample stream k amortizes the tail best
    # so: replicate pixels across lanes ONLY when the pixel block is below the
    # saturation target, and keep each lane's slice as long as allowed.
    LANE_TARGET = 1 << 18
    if pb >= LANE_TARGET:
        r = 1
    else:
        r = max(1, min(LANE_TARGET // pb + 1, rays_per_launch // pb, spp // 8))
    k = min((spp + r - 1) // r, samples_per_launch)
    n_pixel_blocks = (npix + pb - 1) // pb
    n_sample_chunks = (spp + r * k - 1) // (r * k)
    total_launches = n_pixel_blocks * n_sample_chunks

    fingerprint = np.array([w, h, spp, seed, pb, k, r, camera.max_depth], dtype=np.int64)
    film = np.zeros((npix, 3), dtype=np.float64)
    stats = RenderStats()
    start_it = 0
    if checkpoint_path is not None and __import__("os").path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if not np.array_equal(ck["fingerprint"], fingerprint):
            raise ValueError(
                f"checkpoint {checkpoint_path} was written for a different render "
                f"config ({ck['fingerprint']} vs {fingerprint})"
            )
        film = ck["film"]
        start_it = int(ck["next_it"])
        stats.launches = start_it
        stats.paths = int(ck["paths"])
        stats.rays = int(ck["rays"])
        if progress:
            print(f"  resuming at launch {start_it}/{total_launches}", flush=True)

    t0 = _time.perf_counter()
    seed_u32 = jnp.uint32(seed)

    import contextlib

    prof = (
        jax.profiler.trace(profile_dir) if profile_dir is not None else contextlib.nullcontext()
    )
    with prof:
        return _render_loop(
            compiled, camera, sd, cam, film, stats, start_it, total_launches,
            n_pixel_blocks, n_sample_chunks, pb, k, r, npix, w, h, spp, seed_u32,
            fingerprint, checkpoint_path, on_launch, progress, debug_checks, t0,
        )


def _render_loop(
    compiled, camera, sd, cam, film, stats, start_it, total_launches,
    n_pixel_blocks, n_sample_chunks, pb, k, r, npix, w, h, spp, seed_u32,
    fingerprint, checkpoint_path, on_launch, progress, debug_checks, t0,
):
    for it in range(start_it, total_launches):
        pblk, schunk = divmod(it, n_sample_chunks)
        lo = pblk * pb
        ids = np.arange(lo, min(lo + pb, npix), dtype=np.int32)
        n_valid = len(ids)
        if n_valid < pb:  # pad final block (padded rows dropped below)
            ids = np.concatenate([ids, np.zeros(pb - n_valid, np.int32)])
        out, rays = _chunk_film(
            sd,
            cam,
            jnp.asarray(ids),
            jnp.int32(n_valid),
            jnp.int32(schunk * r * k),
            jnp.int32(spp),
            seed_u32,
            k=k,
            r=r,
            max_depth=camera.max_depth,
            has_lights=compiled.has_lights,
            width=w,
        )
        if debug_checks:
            bad = ~np.isfinite(np.asarray(out)[:n_valid])
            if bad.any():
                lanes = np.nonzero(bad.any(axis=-1))[0]
                raise FloatingPointError(
                    f"non-finite film at launch {it} (pixel block {pblk}, sample "
                    f"chunk {schunk}): {len(lanes)} pixels, first ids "
                    f"{ids[lanes[:8]].tolist()}"
                )
        film[ids[:n_valid]] += np.asarray(out)[:n_valid].astype(np.float64)
        stats.launches += 1
        stats.paths += n_valid * min(r * k, spp - schunk * r * k)
        stats.rays += int(rays)
        if checkpoint_path is not None:
            import os

            tmp = checkpoint_path + ".tmp.npz"
            np.savez(
                tmp,
                film=film,
                next_it=np.int64(it + 1),
                paths=np.int64(stats.paths),
                rays=np.int64(stats.rays),
                fingerprint=fingerprint,
            )
            os.replace(tmp, checkpoint_path)  # atomic: partial writes never land
        if on_launch is not None:
            done_spp = min((schunk + 1) * r * k, spp)
            on_launch(
                (film / max(done_spp, 1)).reshape(h, w, 3).astype(np.float32),
                (it + 1) / total_launches,
            )
        if progress and schunk == n_sample_chunks - 1:
            print(f"  pixel block {pblk + 1}/{n_pixel_blocks} done", flush=True)

    stats.wall_s = _time.perf_counter() - t0
    mean = (film / spp).reshape(h, w, 3)
    return tonemap_quantize(mean), mean.astype(NP_REAL), stats

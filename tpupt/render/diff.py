"""Differentiable rendering: detached-sampling reverse-mode pass over the path tracer.

The reference renderer is forward-only (camera.rs:79-126 renders to a PNG and stops).
Differentiability is a new-design capability of this framework (BASELINE.json north
star): pixel gradients w.r.t. the Disney BSDF parameter table, texture colors, and the
environment, computed by reverse-mode AD through the same estimator the forward pass
uses.

Design (Mitsuba-3-style *detached* estimator):

- The bounce loop runs as a fixed-trip `lax.scan` over max_depth (reverse-mode AD
  cannot differentiate `lax.while_loop`); dead lanes are masked, exactly like the
  forward wavefront. The per-bounce body is `jax.checkpoint`-ed so backward memory
  stays O(state), not O(depth * intermediates) — rematerialization trades FLOPs for
  HBM, the right TPU trade.
- Every sampling-derived quantity (sampled directions, mixture pdf, RR survival
  probability) is stop_gradient-ed inside `bounce_step(detach=True)`
  (render/integrator.py). Gradients flow only through integrand factors: bsdf eval,
  emission, environment. Unbiased: with the pdf detached, E[d(f)/p] = d E[f/p].
- Discrete decisions (lobe pick, light pick, RR coin, reflect/refract coin) are
  RNG-driven comparisons — naturally constant under AD; the *same* counter-based RNG
  stream as the forward pass means forward value == trace_radiance value bit-for-bit
  (modulo the zero-pdf guard, which kills a lane instead of minting reference-style
  NaNs, camera.rs:216 — NaNs would poison reverse-mode AD through `where`).

What is differentiable today: `mat_params` (the Disney 11-vector per material — SURVEY
section 2.1 principled.rs:23-42), `tex_rgb` (solid texture colors, which carry diffuse/
metal/glass/principled base colors AND light emission), `env_color`, and `env_img`
(the f32 HDR environment map, ops/envmap.py), and `atlas` (image texels, stored f32
with u8-quantized values for texture.rs:63-68 parity; the nearest-texel gather's
scatter-add adjoint yields per-texel gradients — nearest, not bilinear, because the
reference's lookup IS nearest and parity wins over smoother gradients).

Verified per-pixel against central finite differences (BASELINE.md): max abs err
1.8e-7 (env color) / 4.6e-7 (emission) / 1.1e-5 (albedo) via jax.vjp. CAVEAT: use
jax.vjp / jax.grad, not jax.jacrev — jacrev's vmapped VJP rows come out up to ~3%
off through the checkpointed scan (observed on jax 0.9, CPU backend); single-
cotangent VJPs (what render_grads uses) are exact.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .integrator import bounce_step
from ..core.dtypes import REAL


# SceneData leaves exposed as differentiable parameters.
DIFF_FIELDS = ("mat_params", "tex_rgb", "env_color", "env_img", "atlas")


def init_params(sd) -> dict:
    """Extract the differentiable parameter pytree from a SceneData."""
    return {name: getattr(sd, name) for name in DIFF_FIELDS}


def apply_params(sd, params: dict):
    """Return SceneData with the differentiable leaves swapped for `params`."""
    return dataclasses.replace(sd, **params)


# bounces per early-exit segment (VERDICT round-2 item 4). Path length is
# RR-bounded (p = clamp(lum(T), 0.01, 1) after bounce 5, camera.rs:190-196), so
# on typical scenes nearly every lane is dead long before max_depth=50; a naive
# fixed-trip scan still runs (and re-runs under rematerialized backward) all 50
# bounces. Segmenting the scan and gating each segment on jnp.any(alive) with
# lax.cond skips dead segments in BOTH directions: cond's VJP re-evaluates the
# predicate from the (checkpointed) carry, so the backward pass takes the
# identity branch for segments the forward pass skipped.
SEGMENT = 8


def trace_radiance_scan(
    sd, cam, pixel_ids, rows, cols, sample_ids, seed, max_depth, has_lights,
    segment_size=SEGMENT, with_rays=False,
):
    """Reverse-differentiable twin of trace_radiance: lax.scan over bounces.

    Same estimator, same RNG stream, same return value (radiance [B,3]) — but a
    fixed-trip scan instead of a while_loop, with the detached-sampling bounce
    body. Bounces run in segments of `segment_size` gated on any-lane-alive
    (early exit; 0 disables segmenting — the naive baseline the bench A/Bs
    against). with_rays=True additionally returns the traced-ray count
    (scene intersections, the rays/s unit) as a uint32.
    """
    from .camera import generate_rays

    o, d, time = generate_rays(cam, rows, cols, pixel_ids, sample_ids, seed)
    b = pixel_ids.shape[0]
    p_light = REAL(0.5 if has_lights else 0.0)
    p_bsdf = REAL(1.0) - p_light

    state = (
        o,
        d,
        jnp.ones((b, 3), REAL),  # throughput
        jnp.zeros((b, 3), REAL),  # radiance
        jnp.ones((b,), bool),  # alive
        jnp.uint32(0),  # rays traced (non-diff; integer carries are AD-inert)
    )

    @jax.checkpoint
    def body(carry, bounce):
        o, d, T, L, alive, rays = carry
        # identity for bounce < max_depth; kills the segment-padding trips
        alive = alive & (bounce < max_depth)
        rays = rays + jnp.sum(alive).astype(jnp.uint32)
        o_n, d_n, T, L, alive = bounce_step(
            sd, o, d, time, T, L, alive, bounce, pixel_ids, sample_ids, seed,
            p_light, p_bsdf, has_lights, detach=True,
        )
        o = jnp.where(alive[..., None], o_n, o)
        d = jnp.where(alive[..., None], d_n, d)
        return (o, d, T, L, alive, rays), None

    if segment_size:
        n_seg = -(-max_depth // segment_size)

        def seg_body(carry, seg):
            def run(c):
                c2, _ = lax.scan(
                    body, c,
                    seg * segment_size + jnp.arange(segment_size, dtype=jnp.int32),
                )
                return c2

            return lax.cond(jnp.any(carry[4]), run, lambda c: c, carry), None

        (_, _, _, L, _, rays), _ = lax.scan(
            seg_body, state, jnp.arange(n_seg, dtype=jnp.int32)
        )
    else:
        (_, _, _, L, _, rays), _ = lax.scan(
            body, state, jnp.arange(max_depth, dtype=jnp.int32)
        )
    return (L, rays) if with_rays else L


def trace_film_scan(
    sd, cam, pixel_ids, rows, cols, sample0, spp_limit, seed, k, max_depth,
    has_lights, segment_size=SEGMENT, with_rays=False,
):
    """Reverse-differentiable twin of trace_film_streamed: path REGENERATION
    under a fixed-trip lax.scan (round 5, VERDICT round-4 item 1).

    The masked scan (trace_radiance_scan) runs every (pixel, sample) lane
    through every executed bounce — on Cornell depth-50 that is ~16% occupancy
    (rays counted / lane-trips executed), and the backward pass replays the
    same dead-lane work under rematerialization. The forward renderer solved
    exactly this with path regeneration (integrator.py trace_film_streamed);
    this is its differentiable counterpart:

    - each lane streams its own k-sample slice of one pixel: when a path dies,
      the lane immediately starts its next camera ray (regeneration is
      RNG-driven and parameter-independent — nothing to detach);
    - the trip count is static (k * max_depth worst case) but bounces run in
      `segment_size`-trip segments gated on any-lane-has-work with lax.cond,
      so trips past the last live sample cost one predicate each, forward AND
      backward (cond's VJP takes the identity branch for skipped segments);
    - per-trip bodies are jax.checkpoint-ed: the scan saves O(state) per
      executed trip and the backward replays each trip once (same remat
      schedule as trace_radiance_scan — the win is executing ~4x fewer
      full-width trips, not a cheaper trip).

    Radiance lands in a per-lane FILM SUM (the lane's k samples accumulated),
    so gradients take a per-lane film cotangent — the film-sum/mean gradient
    semantics of render_grads and the sharded grad step, where the cotangent
    is constant across a pixel's samples. Per-(pixel,sample) estimates are NOT
    individually addressable here (use trace_radiance_scan for per-sample
    cotangents); per-sample radiance and the RNG stream are bit-identical to
    trace_radiance / trace_film_streamed.

    Returns film_sum [B,3] (with_rays=True: (film_sum, rays uint32))."""
    from .camera import generate_rays

    b = pixel_ids.shape[0]
    p_light = REAL(0.5 if has_lights else 0.0)
    p_bsdf = REAL(1.0) - p_light
    sample0 = sample0 * jnp.ones_like(pixel_ids)

    @jax.checkpoint
    def body(carry, _):
        o, d, time, T, L, film, alive, bounce, sample, cur_sample, rays = carry

        # ---- regenerate lanes whose path is finished and have samples left ----
        need = (~alive) & (sample < k) & ((sample0 + sample) < spp_limit)
        new_sample = sample0 + sample
        o_new, d_new, t_new = generate_rays(cam, rows, cols, pixel_ids, new_sample, seed)
        nm = need[..., None]
        o = jnp.where(nm, o_new, o)
        d = jnp.where(nm, d_new, d)
        time = jnp.where(need, t_new, time)
        T = jnp.where(nm, 1.0, T)
        L = jnp.where(nm, 0.0, L)
        bounce = jnp.where(need, 0, bounce)
        cur_sample = jnp.where(need, new_sample, cur_sample)
        sample = sample + need.astype(jnp.int32)
        alive = alive | need
        rays = rays + jnp.sum(alive).astype(jnp.uint32)

        # ---- one bounce (detached-sampling estimator) ----
        o_next, d_next, T, L, alive_h = bounce_step(
            sd, o, d, time, T, L, alive, bounce, pixel_ids, cur_sample, seed,
            p_light, p_bsdf, has_lights, detach=True,
        )
        bounce = bounce + 1
        alive_h = alive_h & (bounce < max_depth)

        # ---- flush finished paths into the per-lane film ----
        died = alive & ~alive_h
        film = film + jnp.where(died[..., None], L, 0.0)

        o = jnp.where(alive_h[..., None], o_next, o)
        d = jnp.where(alive_h[..., None], d_next, d)
        return (o, d, time, T, L, film, alive_h, bounce, sample, cur_sample, rays), None

    o0 = jnp.zeros((b, 3), REAL)
    d0 = jnp.concatenate([jnp.zeros((b, 2), REAL), jnp.ones((b, 1), REAL)], -1)
    carry = (
        o0, d0, jnp.zeros((b,), REAL), jnp.ones((b, 3), REAL),
        jnp.zeros((b, 3), REAL), jnp.zeros((b, 3), REAL),
        jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32), jnp.uint32(0),
    )

    def has_work(c):
        _, _, _, _, _, _, alive, _, sample, _, _ = c
        return jnp.any(alive | ((sample < k) & ((sample0 + sample) < spp_limit)))

    n_trips = k * max_depth
    n_seg = -(-n_trips // segment_size)

    def seg_body(c, _):
        def run(c):
            c2, _ = lax.scan(body, c, None, length=segment_size)
            return c2

        return lax.cond(has_work(c), run, lambda c: c, c), None

    (_, _, _, _, _, film, _, _, _, _, rays), _ = lax.scan(
        seg_body, carry, None, length=n_seg
    )
    return (film, rays) if with_rays else film


@partial(jax.jit, static_argnames=("k", "max_depth", "has_lights", "segment_size"))
def _film_grads_step(
    params, sd, cam, pix, rows, cols, lane_sample0, spp, seed, cot, *, k,
    max_depth, has_lights, segment_size,
):
    import numpy as np

    def f(p):
        return trace_film_scan(
            apply_params(sd, p), cam, pix, rows, cols, lane_sample0, spp, seed,
            k, max_depth, has_lights, segment_size=segment_size, with_rays=True,
        )

    (film, rays), vjp = jax.vjp(f, params)
    (grads,) = vjp((cot, np.zeros((), dtype=jax.dtypes.float0)))
    return film, grads, rays


def _film_grads_call(k, max_depth, has_lights, segment_size):
    """Jitted film-grads step, cached per static config so repeat callers
    (bench reps, optimization loops) re-enter the same compiled program."""
    return partial(
        _film_grads_step, k=k, max_depth=max_depth, has_lights=has_lights,
        segment_size=segment_size,
    )


def render_film_grads(
    compiled, camera, spp: int | None = None, seed: int = 0, cotangent=None,
    replicas: int | None = None, segment_size=SEGMENT, return_stats=False,
):
    """Whole-image film + parameter gradients via the regenerating scan.

    The production backward entry (and the `grads` bench config): renders the
    full image at `spp` (default camera.samples_per_pixel) with r lanes per
    pixel each streaming spp/r samples, and returns
    (mean radiance [H,W,3], grads of d(sum_pixels cotangent . mean_sample
    radiance)/d params). cotangent is per-pixel [H*W,3] (default ones — the
    white-image sum, matching render_grads semantics).

    replicas (r) trades lane count against per-lane stream length exactly like
    render_image's scheduler; default targets ~2^18 lanes like the forward
    renderer (the A/B lives in BASELINE.md round 5)."""
    import numpy as np

    sd = compiled.data
    cam = camera.init()
    w, h = camera.image_width, camera.image_height
    spp = camera.samples_per_pixel if spp is None else spp
    npix = w * h
    if replicas is None:
        replicas = max(1, min((1 << 18) // npix, spp))
    while spp % replicas:  # k must be exact: every sample traced exactly once
        replicas -= 1
    r = replicas
    k = spp // r

    pix = jnp.asarray(np.tile(np.arange(npix, dtype=np.int32), r))
    rows, cols = pix // w, pix % w
    lane_sample0 = jnp.repeat(jnp.arange(r, dtype=jnp.int32) * k, npix)

    if cotangent is None:
        cot_pix = jnp.ones((npix, 3), REAL)
    else:
        cot_pix = jnp.asarray(cotangent, REAL).reshape(npix, 3)
    cot = jnp.tile(cot_pix, (r, 1)) / spp

    params = init_params(sd)
    run = _film_grads_call(k, camera.max_depth, compiled.has_lights, segment_size)
    film, grads, rays = run(
        params, sd, cam, pix, rows, cols, lane_sample0, jnp.int32(spp),
        jnp.uint32(seed), cot,
    )
    mean = (film.reshape(r, npix, 3).sum(0) / spp).reshape(h, w, 3)
    if return_stats:
        return mean, grads, int(rays)
    return mean, grads


def segmented_film_vjp(
    params, sd, cam, pixel_ids, rows, cols, sample_ids, seed, max_depth,
    has_lights, cotangent, *, segment_size=SEGMENT, psum_axis=None,
):
    """Radiance + parameter grads via an explicitly segmented backward pass.

    Same estimator and gradients as vjp(trace_radiance_scan), but the scan over
    bounce segments is unrolled into a static Python loop so the backward pass
    is a sequence of per-segment VJPs. Two things fall out of that structure:

    - *early exit* both ways: each segment is gated on any-lane-alive with
      lax.cond, and the backward vjp of a skipped segment takes the identity
      branch;
    - *communication overlap* (VERDICT round-2 item 10, BASELINE.json: "gradient
      all-reduce overlaps the backward wavefront"): with psum_axis set (inside
      shard_map), each segment's parameter-gradient chunk is all-reduced as soon
      as that segment's VJP produces it. No later segment depends on the psum
      results — only the final tree-sum does — so XLA's latency-hiding scheduler
      is free to run the collective concurrently with the next (earlier-bounce)
      segment's backward compute, instead of serializing one big psum after the
      whole backward finishes (the old sharded_grad_step shape).

    cotangent is per-lane [B,3] (d loss / d radiance). Returns (radiance [B,3],
    grads pytree [psum-reduced if psum_axis]).
    """
    from .camera import generate_rays

    o, d, time = generate_rays(cam, rows, cols, pixel_ids, sample_ids, seed)
    b = pixel_ids.shape[0]
    p_light = REAL(0.5 if has_lights else 0.0)
    p_bsdf = REAL(1.0) - p_light
    n_seg = -(-max_depth // segment_size)

    def seg_f(p, carry, seg):
        sd_p = apply_params(sd, p)

        @jax.checkpoint
        def body(c, bounce):
            o, d, T, L, alive = c
            alive = alive & (bounce < max_depth)
            o_n, d_n, T, L, alive = bounce_step(
                sd_p, o, d, time, T, L, alive, bounce, pixel_ids, sample_ids,
                seed, p_light, p_bsdf, has_lights, detach=True,
            )
            o = jnp.where(alive[..., None], o_n, o)
            d = jnp.where(alive[..., None], d_n, d)
            return (o, d, T, L, alive), None

        def run(c):
            c2, _ = lax.scan(
                body, c,
                seg * segment_size + jnp.arange(segment_size, dtype=jnp.int32),
            )
            return c2

        return lax.cond(jnp.any(carry[4]), run, lambda c: c, carry)

    # ---- forward: save segment-boundary carries (n_seg+1 states, O(B) each) ----
    carry = (o, d, jnp.ones((b, 3), REAL), jnp.zeros((b, 3), REAL), jnp.ones((b,), bool))
    carries = [carry]
    for s in range(n_seg):
        carry = seg_f(params, carry, s)
        carries.append(carry)
    radiance = carry[3]

    # ---- backward: per-segment VJP, psum each grad chunk as it appears ----
    import numpy as np

    f0 = np.zeros((b,), dtype=jax.dtypes.float0)  # bool carries take float0 cts
    zero3 = jnp.zeros((b, 3), REAL)
    ct = (zero3, zero3, zero3, jnp.asarray(cotangent, REAL), f0)
    grads = None
    for s in reversed(range(n_seg)):
        _, vjp = jax.vjp(lambda p, c: seg_f(p, c, s), params, carries[s])
        gp, ct = vjp(ct)
        if psum_axis is not None:
            gp = jax.lax.psum(gp, psum_axis)
        grads = gp if grads is None else jax.tree.map(jnp.add, grads, gp)
    return radiance, grads


def make_pixel_fn(compiled, camera, with_rays=False, segment_size=SEGMENT):
    """Build `f(params, pixel_ids, rows, cols, sample_ids, seed) -> radiance [B,3]`.

    The returned function is pure in `params` (the DIFF_FIELDS pytree) and composes
    with jax.grad / jax.vjp / jax.jit. Sample averaging is the caller's job: pass
    (pixel, sample) pairs flattened along the batch axis like the forward renderer.
    with_rays=True makes it return (radiance, rays_traced) instead.
    """
    sd = compiled.data
    cam = camera.init()
    max_depth = camera.max_depth
    has_lights = compiled.has_lights

    def f(params, pixel_ids, rows, cols, sample_ids, seed):
        return trace_radiance_scan(
            apply_params(sd, params), cam, pixel_ids, rows, cols, sample_ids, seed,
            max_depth, has_lights, segment_size=segment_size, with_rays=with_rays,
        )

    return f


@partial(jax.jit, static_argnames=("fn",))
def _value_and_grad_call(fn, params, args, cotangent):
    """fn must return (radiance, rays): VJP w.r.t. params with rays as aux."""
    import numpy as np

    (val, rays), vjp = jax.vjp(lambda p: fn(p, *args), params)
    # integer outputs take float0 cotangents
    (grads,) = vjp((cotangent, np.zeros((), dtype=jax.dtypes.float0)))
    return val, grads, rays


def render_grads(
    compiled,
    camera,
    pixel_ids,
    spp: int,
    seed: int = 0,
    cotangent=None,
    segment_size=SEGMENT,
    return_stats=False,
):
    """Pixel radiances + parameter gradients for a pixel block.

    Returns (radiance [npix,3] averaged over spp, grads pytree of
    d<sum(cotangent * radiance)>/d{mat_params, tex_rgb, env_color}).
    cotangent defaults to ones — i.e. the gradient of the total (white) image sum,
    averaged per sample so grads are per-pixel-mean scale.
    return_stats=True appends the traced-ray count (forward scene intersections;
    the backward replays each of them once more under rematerialization, so a
    fwd+bwd "rays/s" figure uses this count against the combined wall time).
    """
    import numpy as np

    fn = make_pixel_fn(compiled, camera, with_rays=True, segment_size=segment_size)
    w = camera.image_width
    pix = jnp.asarray(np.repeat(np.asarray(pixel_ids, np.int32), spp))
    rows, cols = pix // w, pix % w
    samp = jnp.asarray(np.tile(np.arange(spp, dtype=np.int32), len(pixel_ids)))

    npix = len(pixel_ids)
    if cotangent is None:
        cot = jnp.ones((npix, spp, 3), REAL) / spp
    else:
        cot = jnp.broadcast_to(
            jnp.asarray(cotangent, REAL)[:, None, :], (npix, spp, 3)
        ) / spp

    params = init_params(compiled.data)
    val, grads, rays = _value_and_grad_call(
        fn, params, (pix, rows, cols, samp, jnp.uint32(seed)), cot.reshape(-1, 3)
    )
    radiance = val.reshape(npix, spp, 3).mean(axis=1)
    if return_stats:
        return radiance, grads, int(rays)
    return radiance, grads

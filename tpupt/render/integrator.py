"""The path-tracing integrator: a masked, shape-static wavefront loop under jit.

Reproduces the exact estimator of Camera::trace (camera.rs:170-228):

  for bounce in 0..max_depth:
      hit = intersect everything in (1e-3, inf)
      miss  -> radiance += T * environment; stop
      radiance += T * emitted
      bounce > 5 -> russian roulette with p = clamp(luminance(T), 0.01, 1)
      one-sample MIS: with prob p_light sample the light list, else the BSDF
      (sample = None -> stop)
      pdf  = p_bsdf * bsdf_pdf + p_light * light_pdf   (mixture, camera.rs:212-214)
      T   *= eval / pdf
      next origin = hit + 1e-3 * sign(dir . ng) * ng   (camera.rs:217-222)

Control flow is TPU-native: instead of per-path `break`s, every lane carries an
`alive` mask and the whole wavefront iterates under `lax.while_loop` until all lanes
die or max_depth is reached. Division by a zero pdf is left unguarded exactly like the
reference (NaNs quantize to black, film.rs... see film.py).

p_light is 0.5 iff the scene has lights (camera.rs:199) and is a *static* Python value:
scenes 4 & 6 place emissive objects in `objects` so their lights list is empty and MIS
degenerates to pure BSDF sampling — reproduced here by compiling the light-sampling
branch out entirely.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

# Occupancy instrumentation (debug only): occ=True (default via TPUPT_OCC=1)
# adds a lane-iteration counter to the streamed wavefront state and a THIRD
# return value, so tools/probe_occupancy.py can report rays/lane-iterations =
# live fraction. Production callers (renderer.py) pass occ=False explicitly, so
# their 2-tuple arity is stable no matter the env (ADVICE round-3 item 1).
_OCC = os.environ.get("TPUPT_OCC", "") == "1"

from ..core import linalg as la
from ..core import rng
from ..ops import lights as light_ops
from ..ops.bsdf import bsdf_eval, bsdf_pdf, bsdf_sample, make_shade
from ..ops.envmap import sample_environment
from ..ops.intersect import closest_hit
from ..core.dtypes import NP_REAL, REAL

T_MIN = NP_REAL(1e-3)  # camera.rs:171
T_MAX = la.BIG
EPS = NP_REAL(1e-3)  # bsdf/mod.rs:19
MIN_BOUNCES = 5  # camera.rs:172


def bounce_step(
    sd,
    o,
    d,
    time,
    T,
    L,
    alive,
    bounce,
    pixel_ids,
    sample_ids,
    seed,
    p_light,
    p_bsdf,
    has_lights,
    *,
    detach=False,
):
    """One bounce of the reference estimator (camera.rs:177-226) over a lane batch.

    Shared by the masked wavefront (trace_radiance), the path-regeneration wavefront
    (trace_film_streamed) and the differentiable scan integrator (render/diff.py).

    Returns (o_next, d_next, T, L, alive) — callers mask o/d updates by `alive`.

    detach=True builds the *detached-sampling* estimator for reverse-mode AD
    (Mitsuba-3-style): every sampling-derived quantity — sampled directions, the
    mixture pdf, the russian-roulette survival probability — is wrapped in
    stop_gradient, so pixel gradients flow only through the integrand factors
    (bsdf eval, emission, environment). This is the unbiased detached estimator:
    E[d(f)/p] = d∫f since p carries no gradient. It also guards the pdf division
    (a zero pdf kills the lane instead of minting NaNs to quantize away like
    camera.rs:216 does) because NaN * 0-mask still poisons reverse-mode AD.
    """
    sg = lax.stop_gradient if detach else (lambda x: x)

    hit = closest_hit(sd, o, d, time, T_MIN, T_MAX, alive=alive)

    # miss -> environment (camera.rs:180-183)
    env = sample_environment(sd, d)
    missed = alive & ~hit.valid
    L = L + jnp.where(missed[..., None], T * env, 0.0)
    alive = alive & hit.valid

    # emission from the hit (camera.rs:186-187)
    shade = make_shade(sd, hit.mat_id, hit.u, hit.v, hit.point, hit.ng, hit.ns, hit.front)
    L = L + jnp.where(alive[..., None], T * shade.emission, 0.0)

    # per-bounce uniforms
    ctrl = rng.bounce_ctr(bounce)
    rr_u, mis_r, light_pick, lobe_u = rng.uniform4(
        seed, pixel_ids, sample_ids, ctrl + rng.SLOT_CTRL
    )
    e1, e2, fresnel_u, _ = rng.uniform4(seed, pixel_ids, sample_ids, ctrl + rng.SLOT_BSDF)
    lu1, lu2, _, _ = rng.uniform4(seed, pixel_ids, sample_ids, ctrl + rng.SLOT_LIGHT)

    # russian roulette after MIN_BOUNCES (camera.rs:190-196)
    p = sg(jnp.clip(la.luminance(T), 0.01, 1.0))
    rr_on = alive & (bounce > MIN_BOUNCES)
    die = rr_on & (rr_u > p)
    alive = alive & ~die
    T = jnp.where((rr_on & alive)[..., None], T / p[..., None], T)

    # one-sample MIS between light and BSDF sampling (camera.rs:198-211)
    view = -d
    b_dir, b_ok = bsdf_sample(shade, view, lobe_u, e1, e2, fresnel_u)
    if has_lights:
        l_dir, l_is_env = light_ops.sample_lights(sd, hit.point, time, light_pick, lu1, lu2)
        if sd.env_is_hdr:
            # env member aimed below the shading horizon of an opaque lane: the
            # reference's |cos| eval would transmit — treat as a failed sample
            # (sample() -> None kills the path, camera.rs:209-211) so the
            # estimator integrates the physically clamped BRDF. Transmissive
            # families (glass, principled) keep below-horizon directions.
            from ..scene.data import MAT_DIFFUSE, MAT_METAL

            opaque = (shade.mtype == MAT_DIFFUSE) | (shade.mtype == MAT_METAL)
            below = jnp.sum(l_dir * hit.ns, axis=-1) <= 0.0
            l_ok = ~(l_is_env & opaque & below)
        else:
            l_ok = jnp.ones_like(b_ok)
        use_light = mis_r < p_light
        new_dir = jnp.where(use_light[..., None], l_dir, b_dir)
        ok = jnp.where(use_light, l_ok, b_ok)
    else:
        new_dir = b_dir
        ok = b_ok
    new_dir = sg(new_dir)
    alive = alive & ok

    # mixture pdf + eval (camera.rs:212-216)
    pdf_b = bsdf_pdf(shade, view, new_dir)
    if has_lights:
        pdf_l = light_ops.pdf_lights(sd, hit.point, new_dir, time)
        pdf = p_bsdf * pdf_b + p_light * pdf_l
    else:
        pdf = p_bsdf * pdf_b
    brdf = bsdf_eval(shade, view, new_dir)
    if detach:
        pdf = sg(pdf)
        alive = alive & (pdf > 0.0)
        atten = brdf / jnp.where(pdf > 0.0, pdf, 1.0)[..., None]
    else:
        atten = brdf / pdf[..., None]  # unguarded, like the reference (camera.rs:216)
    T = jnp.where(alive[..., None], T * atten, T)

    # offset next origin along the geometric normal (camera.rs:217-222)
    eps = EPS * jnp.sign(jnp.sum(new_dir * hit.ng, axis=-1))
    o_next = hit.point + eps[..., None] * hit.ng
    d_next = la.normalize(new_dir, eps=1e-30)  # Ray::new normalizes (ray.rs:26)

    return o_next, d_next, T, L, alive


def trace_radiance(sd, cam, pixel_ids, rows, cols, sample_ids, seed, max_depth, has_lights):
    """Trace one path per lane; returns (radiance [B,3], rays_traced scalar uint32).

    rays_traced counts scene intersections actually performed (the "rays/s" unit of
    BASELINE.json). max_depth and has_lights must be static (Python) values.
    """
    from .camera import generate_rays

    o, d, time = generate_rays(cam, rows, cols, pixel_ids, sample_ids, seed)
    b = pixel_ids.shape[0]
    p_light = REAL(0.5 if has_lights else 0.0)
    p_bsdf = REAL(1.0) - p_light

    state = dict(
        bounce=jnp.int32(0),
        o=o,
        d=d,
        time=time,
        throughput=jnp.ones((b, 3), REAL),
        radiance=jnp.zeros((b, 3), REAL),
        alive=jnp.ones((b,), bool),
        rays=jnp.uint32(0),
    )

    def cond(s):
        return (s["bounce"] < max_depth) & jnp.any(s["alive"])

    def body(s):
        bounce = s["bounce"]
        o, d, time = s["o"], s["d"], s["time"]
        T, L, alive = s["throughput"], s["radiance"], s["alive"]
        rays = s["rays"] + jnp.sum(alive).astype(jnp.uint32)

        o_next, d_next, T, L, alive = bounce_step(
            sd, o, d, time, T, L, alive, bounce, pixel_ids, sample_ids, seed,
            p_light, p_bsdf, has_lights,
        )

        return dict(
            bounce=bounce + 1,
            o=jnp.where(alive[..., None], o_next, o),
            d=jnp.where(alive[..., None], d_next, d),
            time=time,
            throughput=T,
            radiance=L,
            alive=alive,
            rays=rays,
        )

    out = lax.while_loop(cond, body, state)
    return out["radiance"], out["rays"]


def trace_film_streamed(
    sd, cam, pixel_ids, rows, cols, sample0, spp_limit, seed, k, max_depth, has_lights,
    occ=_OCC,
):
    """Path-regeneration wavefront: each lane streams up to k samples of its pixel.

    The reference estimator is per-sample identical to trace_radiance — every
    (pixel, sample) path consumes the same counter-based RNG stream and follows
    camera.rs:170-228 exactly. What changes is scheduling:

    - *regeneration*: a lane that finishes sample s immediately regenerates the
      camera ray for sample s+1, so utilization stays near 100% while lanes have
      samples left (vs k masked 50-iteration waves where ~80% idle by bounce 10);
    - *tail compaction*: path length is pixel-correlated (a glass pixel's lanes
      run 10x the sky pixels'), so once most lanes exhaust their samples the
      wavefront limps along at a few % occupancy — scene 6 measured 6% overall,
      2500 ns per counted ray vs the 149 ns bounce cost. When live work drops
      below b/4 the state is argsort-compacted into a b/4-lane batch (static
      shapes; XLA sort + small gathers, once), then b/16, then b/64. Each lane
      carries its origin index so films scatter back exactly.

    Returns (film_sum [B,3] in the caller's lane order, rays_traced uint32).
    """
    b = pixel_ids.shape[0]
    state = dict(
        pix=pixel_ids,
        row=rows,
        col=cols,
        sample0=sample0 * jnp.ones_like(pixel_ids),
        lane=jnp.arange(b, dtype=jnp.int32),
        o=jnp.zeros((b, 3), REAL),
        d=jnp.concatenate([jnp.zeros((b, 2), REAL), jnp.ones((b, 1), REAL)], -1),
        time=jnp.zeros((b,), REAL),
        bounce=jnp.zeros((b,), jnp.int32),
        sample=jnp.zeros((b,), jnp.int32),  # per-lane sample cursor (samples started)
        cur_sample=jnp.zeros((b,), jnp.int32),  # sample id of the in-flight path
        throughput=jnp.ones((b, 3), REAL),
        radiance=jnp.zeros((b, 3), REAL),
        film=jnp.zeros((b, 3), REAL),
        alive=jnp.zeros((b,), bool),
        rays=jnp.uint32(0),
    )
    if occ:
        state["li"] = jnp.uint32(0)

    def work_mask(s):
        return s["alive"] | (
            (s["sample"] < k) & ((s["sample0"] + s["sample"]) < spp_limit)
        )

    # NOTE on ray sorting: re-sorting lanes by quantized direction each
    # iteration (to shrink the packet kernel's per-row cluster unions) was
    # measured and REJECTED: the [b] argsort + 20-array state gather cost 2.5x
    # more than it saved on scene 6 (4.8 -> 1.9 M rays/s) — TPU sorts/gathers
    # are the same ops that sank the per-lane BVH. Compaction below sorts only
    # at the three occupancy thresholds, where it pays for itself.
    body = _make_stream_body(sd, cam, spp_limit, seed, k, max_depth, has_lights, occ=occ)

    # compaction schedule. Cluster scenes (round 3): instrumentation showed the
    # packet kernel's per-iteration cost is nearly flat in occupancy — a dead
    # lane costs ~as much as a live one — so end-to-end throughput is ~the
    # average occupancy. A factor-2 ladder measured 0.765 occupancy on scene 6
    # (tools/probe_occupancy.py: stage occupancy decays 1.0 -> 0.5 before the
    # next compaction); the sqrt(2) ladder keeps every stage above ~0.71 for an
    # expected ~0.84 average. Each stage is another while_loop instance of the
    # bounce body for the compiler (one-time compile cost per config, cached).
    # Non-cluster scenes keep the short ladder: their bounce is ~9 ns/lane
    # (Cornell ~87% occupancy already). Both end with threshold 0.
    # TPUPT_LADDER=short forces the non-cluster schedule for on-chip A/Bs.
    if (sd.has_tri_clusters or sd.has_tri_clusters_hbm) and (
        os.environ.get("TPUPT_LADDER", "sqrt2") != "short"
    ):
        thresholds = []
        t = b
        while True:
            t = int(t / 1.4142135624) & ~1023  # lane counts in whole kernel rows
            if t < 2048:
                break
            if not thresholds or t < thresholds[-1]:
                thresholds.append(t)
        thresholds.append(0)
    else:
        thresholds = [t for t in (b // 2, b // 8, b // 32) if t >= 4096] + [0]
    bank = jnp.zeros((b, 3), REAL)
    for thr in thresholds:
        if thr:
            def cond(s, thr=thr):
                w = work_mask(s)
                return jnp.any(w) & (jnp.sum(w) > thr)
        else:
            def cond(s):
                return jnp.any(work_mask(s))
        state = lax.while_loop(cond, body, state)
        if thr:
            keep = jnp.argsort(~work_mask(state), stable=True)[:thr]
            bank = bank.at[state["lane"]].add(state["film"])
            state = {
                key: (val if jnp.ndim(val) == 0 else jnp.take(val, keep, axis=0))
                for key, val in state.items()
            }
            state["film"] = jnp.zeros((thr, 3), REAL)
    bank = bank.at[state["lane"]].add(state["film"])
    if occ:
        return bank, state["rays"], state["li"]
    return bank, state["rays"]


def _make_stream_body(sd, cam, spp_limit, seed, k, max_depth, has_lights, sort_rays=False,
                      occ=False):
    """One wavefront iteration: regenerate exhausted lanes, bounce, flush films."""
    from .camera import generate_rays

    p_light = REAL(0.5 if has_lights else 0.0)
    p_bsdf = REAL(1.0) - p_light

    def sort_state(s):
        # 4 bits per direction axis -> 12-bit coherence key; dead lanes last
        q = jnp.clip(((s["d"] + 1.0) * 8.0).astype(jnp.int32), 0, 15)
        key = (q[..., 0] << 8) | (q[..., 1] << 4) | q[..., 2]
        key = jnp.where(s["alive"], key, 1 << 14)
        order = jnp.argsort(key, stable=True)
        return {
            kk: (v if jnp.ndim(v) == 0 else jnp.take(v, order, axis=0))
            for kk, v in s.items()
        }

    def body(s):
        if sort_rays:
            s = sort_state(s)
        o, d, time = s["o"], s["d"], s["time"]
        T, L, film, alive = s["throughput"], s["radiance"], s["film"], s["alive"]
        bounce, sample, cur_sample = s["bounce"], s["sample"], s["cur_sample"]
        sample0 = s["sample0"]

        # ---- regenerate lanes whose path is finished and have samples left ----
        need = (~alive) & (sample < k) & ((sample0 + sample) < spp_limit)
        new_sample = sample0 + sample
        o_new, d_new, t_new = generate_rays(cam, s["row"], s["col"], s["pix"], new_sample, seed)
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

        rays = s["rays"] + jnp.sum(alive).astype(jnp.uint32)

        # ---- one bounce (identical estimator to trace_radiance) ----
        o_next, d_next, T, L, alive_h = bounce_step(
            sd, o, d, time, T, L, alive, bounce, s["pix"], cur_sample, seed,
            p_light, p_bsdf, has_lights,
        )

        bounce = bounce + 1
        # max_depth exit: the reference loop just stops after max_depth iterations
        alive_h = alive_h & (bounce < max_depth)

        # ---- flush finished paths into the per-lane film ----
        died = alive & ~alive_h
        film = film + jnp.where(died[..., None], L, 0.0)

        extra = {"li": s["li"] + jnp.uint32(alive.shape[0])} if occ else {}
        return dict(
            **extra,
            pix=s["pix"],
            row=s["row"],
            col=s["col"],
            sample0=sample0,
            lane=s["lane"],
            o=jnp.where(alive_h[..., None], o_next, o),
            d=jnp.where(alive_h[..., None], d_next, d),
            time=time,
            bounce=bounce,
            sample=sample,
            cur_sample=cur_sample,
            throughput=T,
            radiance=L,
            film=film,
            alive=alive_h,
            rays=rays,
        )

    return body

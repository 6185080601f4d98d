"""On-chip decomposition of the backward-pass cost (VERDICT round-4 item 1).

The grads bench config (bench.py run_grads: Cornell 128px, 32 spp, depth 50,
524k lanes through trace_radiance_scan + VJP) measured 1.65-3.54M rays/s on
TPU vs 8.35M on CPU in round 3/4 with zero TPU profiling. This probe times the
pieces separately on the attached chip:

  fwd      forward-only segmented scan (with_rays), jitted — the occupancy
           story: the masked scan runs every lane at every executed bounce
  fwdbwd   the exact bench computation (_value_and_grad_call)
  leaves   fwd+bwd but differentiating ONE leaf at a time — isolates the
           scatter-add adjoints (mat_params gather adjoint vs atlas vs env)

Run: timeout 1800 python tools/probe_grads.py [fwd fwdbwd leaves ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpupt.render.diff import (  # noqa: E402
    _value_and_grad_call, init_params, make_pixel_fn,
)
from tpupt.scenes import cornell_box_scene  # noqa: E402

REPS = int(os.environ.get("PROBE_REPS", 3))


def setup():
    spp = 32
    scene, cam = cornell_box_scene(128, spp)
    compiled = scene.compile()
    w, h = cam.image_width, cam.image_height
    npix = w * h
    pix = jnp.asarray(np.repeat(np.arange(npix, dtype=np.int32), spp))
    rows, cols = pix // w, pix % w
    samp = jnp.asarray(np.tile(np.arange(spp, dtype=np.int32), npix))
    cot = jnp.ones((npix * spp, 3), jnp.float32) / spp
    params = init_params(compiled.data)
    args = (pix, rows, cols, samp, jnp.uint32(0))
    return compiled, cam, params, args, cot


def timed(fn, *a):
    out = jax.block_until_ready(fn(*a))  # compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return out, ts


def report(tag, rays, ts):
    med = sorted(ts)[len(ts) // 2]
    print(
        f"{tag:28s} rays={int(rays):>10d} med={med*1e3:8.1f} ms "
        f"rays/s={int(rays)/med/1e6:7.2f}M band=[{min(ts)*1e3:.1f},{max(ts)*1e3:.1f}]ms",
        flush=True,
    )
    return med


def main(modes):
    compiled, cam, params, args, cot = setup()
    fn = make_pixel_fn(compiled, cam, with_rays=True)

    if "fwd" in modes:
        f = jax.jit(lambda p: fn(p, *args))
        (_, rays), ts = timed(f, params)
        report("fwd-only (masked scan)", rays, ts)

    if "fwdbwd" in modes:
        (_, _, rays), _ = _value_and_grad_call(fn, params, args, cot), None
        _, ts = timed(lambda: _value_and_grad_call(fn, params, args, cot))
        report("fwd+bwd all leaves (bench)", rays, ts)

    if "stream" in modes:
        # the round-5 regenerating scan at several (r, k) schedules
        from tpupt.render.diff import render_film_grads

        for r in (2, 4, 8, 16, 32):
            def g(r=r):
                return render_film_grads(
                    compiled, cam, spp=32, seed=0, replicas=r, return_stats=True
                )

            (_, _, rays0) = g()  # compile
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                _, grads, rays = g()
                jax.block_until_ready(grads)
                ts.append(time.perf_counter() - t0)
            report(f"stream fwd+bwd r={r} k={32//r}", rays, ts)

    if "leaves" in modes:
        for leaf in params:
            rest = {k: v for k, v in params.items() if k != leaf}

            def fn_leaf(p_one, leaf=leaf, rest=rest):
                return fn({**rest, leaf: p_one[leaf]}, *args)

            @jax.jit
            def g(p_one, fn_leaf=fn_leaf):
                (val, rays), vjp = jax.vjp(fn_leaf, p_one)
                (grads,) = vjp((cot, np.zeros((), dtype=jax.dtypes.float0)))
                return grads, rays

            (grads, rays), ts = timed(g, {leaf: params[leaf]})
            report(f"fwd+bwd leaf={leaf}", rays, ts)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["fwd", "fwdbwd", "leaves"]
    main(modes)

"""Benchmark harness: rays/s/chip on the Cornell box (BASELINE.json metric #1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: render the fast-mode Cornell box (600 px, scene 3 constants) on the attached
chip, counting actual scene intersections (every wavefront bounce of every live lane)
inside the jitted kernel. The first launch (compile) is excluded; throughput is
measured over the subsequent warm launches that cover the full sample budget.

vs_baseline compares against the reference estimate derived in BASELINE.md
(REF_RAYS_PER_S): the Rust CPU tracer's throughput reconstructed from its midterm
report timing, scaled to a release+rayon build (no Rust toolchain exists in this
image to measure it directly).
"""

import json
import os
import sys
import time

# persistent compile cache (the sandbox compiles XLA programs remotely; see tests/conftest.py)
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

# Reference baseline (see BASELINE.md "Reference throughput estimate"):
# midterm report: ~25 min for ~HD(1280x720) x 1000 spp single-thread pre-BVH
# => ~0.6M paths/s; ~5 rays/path with RR => ~3M rays/s single-thread;
# x10 for the final release+rayon build on a contemporary laptop => 3e7 rays/s.
REF_RAYS_PER_S = 3.0e7

# defaults: the reference fast-mode / BASELINE.json config 1. Override for the
# full FHD metric: BENCH_WIDTH=1920 BENCH_SPP=4000 python bench.py
BENCH_SPP = int(os.environ.get("BENCH_SPP", 100))
WIDTH = int(os.environ.get("BENCH_WIDTH", 600))


def main():
    from tpupt.render.renderer import render_image
    from tpupt.scenes import cornell_box_scene

    scene, cam = cornell_box_scene(WIDTH, BENCH_SPP)
    compiled = scene.compile()
    print("# scene compiled", file=sys.stderr, flush=True)

    # warm-up: run the EXACT launch shapes once. k/r/pb are static jit args, so
    # warming with different shapes compiles a different program and the timed
    # run would pay the compile (an earlier bench bug: it reported 16M rays/s
    # where the warm kernel does ~90M). For big configs warm with a reduced spp
    # that still uses the same (pb, k, r).
    import copy

    warm_cam = copy.copy(cam)
    warm_cam.samples_per_pixel = min(cam.samples_per_pixel, 128)
    render_image(compiled, warm_cam, rays_per_launch=1 << 20, progress=False)
    print("# warmup done", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    _, _, stats = render_image(compiled, cam, rays_per_launch=1 << 20, progress=False)
    wall = time.perf_counter() - t0

    rays_per_s = stats.rays / wall
    print(
        json.dumps(
            {
                "metric": "cornell_rays_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / REF_RAYS_PER_S, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

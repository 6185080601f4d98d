"""On-chip decomposition of the envmap-scene bounce (VERDICT round-4 item 3).

`lights` ran at 26.5M rays/s (1.4% of the analytic VPU SOL) and `lights_hdr`
at 17.6M (0.9%) in BENCH_r04 with no profile of where the other ~98.6% goes.
This probe times the bounce's pieces as standalone jitted kernels on a
production-sized lane batch, then the full streamed iteration, so the gap can
be attributed: intersect | env-miss lookup | camera regen | shade/MIS/RNG.

Modes:
  parts   per-piece timings (closest_hit, sample_environment, generate_rays,
          bounce_step) for the u8-map and HDR-IS scene variants
  e2e     end-to-end render_image rays/s for u8 / hdr / constant-color env
          (constant-color isolates the env-texture gather cost end-to-end)

Run: timeout 2400 python tools/probe_lights.py [parts e2e]
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

from tpupt.scenes import environment_map_scene  # noqa: E402

REPS = int(os.environ.get("PROBE_REPS", 5))
B = int(os.environ.get("PROBE_LANES", 1 << 19))


def timed(f, *a):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    return med


def report(tag, med, lanes=B):
    print(f"{tag:36s} {med*1e3:8.3f} ms  {med/lanes*1e9:8.2f} ns/lane", flush=True)


def parts():
    from tpupt.core import rng
    from tpupt.ops.envmap import pdf_env_light, sample_env_light, sample_environment
    from tpupt.ops.intersect import closest_hit
    from tpupt.render.camera import generate_rays
    from tpupt.render.integrator import bounce_step

    key = np.random.default_rng(0)
    d = key.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    o = jnp.zeros((B, 3), jnp.float32) + jnp.asarray([0.0, 3.0, 17.0])
    tm = jnp.zeros((B,), jnp.float32)
    pix = jnp.arange(B, dtype=jnp.int32) % (600 * 338)
    samp = jnp.zeros((B,), jnp.int32)
    alive = jnp.ones((B,), bool)

    for hdr in (False, True):
        scene, cam = environment_map_scene(600, 100, hdr_env=hdr)
        compiled = scene.compile()
        sd = compiled.data
        c = cam.init()
        tag = "hdr" if hdr else "u8 "

        report(
            f"[{tag}] closest_hit",
            timed(jax.jit(lambda o, d, t: closest_hit(sd, o, d, t, 1e-3, 1e30, alive=alive).t), o, d, tm),
        )
        report(
            f"[{tag}] sample_environment (miss)",
            timed(jax.jit(lambda d: sample_environment(sd, d)), d),
        )
        report(
            f"[{tag}] generate_rays (regen)",
            timed(jax.jit(lambda r, cc: generate_rays(c, r, cc, pix, samp, jnp.uint32(0))[0]), pix // 600, pix % 600),
        )
        if hdr:
            u1, u2, _, _ = rng.uniform4(jnp.uint32(0), pix, samp, jnp.uint32(7))
            report(
                f"[{tag}] sample_env_light+pdf",
                timed(
                    jax.jit(
                        lambda u1, u2, d: (
                            sample_env_light(sd, u1, u2)[0] + pdf_env_light(sd, d)
                        )
                    ),
                    u1, u2, d,
                ),
            )

        T = jnp.ones((B, 3), jnp.float32)
        L = jnp.zeros((B, 3), jnp.float32)
        hl = compiled.has_lights
        pl = jnp.float32(0.5 if hl else 0.0)
        pb = jnp.float32(1.0) - pl

        def full(o, d, tm, T, L):
            return bounce_step(
                sd, o, d, tm, T, L, alive, jnp.int32(0), pix, samp,
                jnp.uint32(0), pl, pb, hl,
            )[3]

        report(f"[{tag}] bounce_step (full)", timed(jax.jit(full), o, d, tm, T, L))


def e2e():
    from tpupt.render.renderer import render_image
    from tpupt.scene.builder import Scene

    def run(tag, scene, cam):
        compiled = scene.compile()
        render_image(compiled, cam, rays_per_launch=1 << 20, progress=False)
        t0 = time.perf_counter()
        _, _, stats = render_image(compiled, cam, rays_per_launch=1 << 20, progress=False)
        wall = time.perf_counter() - t0
        print(
            f"e2e {tag:24s} {stats.rays/wall/1e6:8.2f}M rays/s  "
            f"(rays={stats.rays}, {wall*1e3:.0f} ms)",
            flush=True,
        )

    scene, cam = environment_map_scene(600, 100)
    run("u8 map", scene, cam)
    scene, cam = environment_map_scene(600, 100, hdr_env=True)
    run("hdr IS", scene, cam)
    scene, cam = environment_map_scene(600, 100)
    scene.environment = (0.5, 0.6, 0.7)  # constant: no env gather at all
    run("constant color", scene, cam)

    if os.environ.get("PROBE_NOTRIG", "") == "1":
        # cost-attribution control (WRONG image): the u8 fast path with the
        # direction->equirect trig (arccos + atan2) replaced by a linear fake,
        # same single atlas gather — isolates transcendental cost from gather
        # cost inside the real render loop.
        import jax.numpy as jnp

        from tpupt.core.dtypes import REAL
        from tpupt.render import integrator as integ

        real_env = integ.sample_environment

        def fake_env(sd, direction):
            if sd.env_map_w > 0:
                u = direction[..., 0] * 0.5 + 0.5
                v = direction[..., 1] * 0.5 + 0.5
                w = REAL(sd.env_map_w)
                h = REAL(sd.env_map_h)
                i = jnp.minimum((u * w).astype(jnp.int32), sd.env_map_w - 1)
                j = jnp.minimum((v * h).astype(jnp.int32), sd.env_map_h - 1)
                return jnp.take(sd.atlas, sd.env_map_off + j * sd.env_map_w + i, axis=0)
            return real_env(sd, direction)

        integ.sample_environment = fake_env
        try:
            scene, cam = environment_map_scene(600, 100)
            run("u8 NOTRIG (wrong image)", scene, cam)
        finally:
            integ.sample_environment = real_env


if __name__ == "__main__":
    modes = sys.argv[1:] or ["parts", "e2e"]
    if "parts" in modes:
        parts()
    if "e2e" in modes:
        e2e()

"""Measure streamed-wavefront occupancy for a bench config on the real chip.

Occupancy = counted rays / lane-iterations (TPUPT_OCC=1 instrumentation in
render/integrator.py). Discriminates the two scene-6 levers: if occupancy is
already high, the kernel's per-row union cost is the ceiling; if low, the
compaction ladder needs work.

Usage: /opt/venv/bin/python tools/probe_occupancy.py [scene6|cornell|bigmesh|lights]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TPUPT_OCC"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tpupt.render.integrator import trace_film_streamed
from tpupt.render.renderer import _morton_pixel_order

name = sys.argv[1] if len(sys.argv) > 1 else "scene6"
if name == "scene6":
    from tpupt.scenes import everything_scene as make
elif name == "lights":
    from tpupt.scenes import environment_map_scene as make
elif name == "bigmesh":
    def make(w, spp):
        from tpupt.io.obj import load_obj, subdivide_mesh
        from tpupt.render.camera import Camera
        from tpupt.scene.builder import Diffuse, Scene

        s = Scene()
        mesh = subdivide_mesh(load_obj("/root/reference/assets/bunny.obj"), 3)
        s.add_mesh(mesh, Diffuse((0.7, 0.7, 0.7)), scale=20.0)
        s.environment = (1.0, 1.0, 1.0)
        cam = Camera(
            aspect_ratio=1.0, image_width=w, samples_per_pixel=spp,
            max_depth=50, vfov=35.0, look_from=(0.0, 1.0, 6.0),
            look_at=(0.0, 1.0, 0.0), blur_strength=0.5, focal_length=5.0,
            defocus_angle=0.0,
        )
        return s, cam
else:
    from tpupt.scenes import cornell_box_scene as make

W, SPP = 600, int(os.environ.get("PROBE_SPP", "100"))
if name == "bigmesh":
    SPP = min(SPP, 25)
scene, camera = make(W, SPP)
compiled = scene.compile()
sd = compiled.data
cam = camera.init()
w, h = camera.image_width, camera.image_height
npix = w * h
order = _morton_pixel_order(w, h)
pix = jnp.asarray(order)
rows = pix // w
cols = pix % w
sample0 = jnp.zeros((npix,), jnp.int32)

fn = jax.jit(
    lambda pix, rows, cols, s0: trace_film_streamed(
        sd, cam, pix, rows, cols, s0, jnp.int32(SPP), jnp.uint32(0), SPP,
        camera.max_depth, compiled.has_lights,
    )
)
print(f"# {name}: {npix} lanes x {SPP} samples", flush=True)
out = fn(pix, rows, cols, sample0)
jax.block_until_ready(out)
t0 = time.perf_counter()
film, rays, li = fn(pix, rows, cols, sample0)
jax.block_until_ready(film)
dt = time.perf_counter() - t0
rays, li = int(rays), int(li)
print(
    f"rays={rays/1e6:.1f}M lane_iters={li/1e6:.1f}M occupancy={rays/li:.3f} "
    f"rays/s={rays/dt/1e6:.2f}M wall={dt:.2f}s",
    flush=True,
)

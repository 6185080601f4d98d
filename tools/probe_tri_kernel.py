"""Microbench the cluster packet kernel on the real chip.

Times pallas_closest_tri on scene 6's triangle table for two ray populations:
- worst-case: 256k fully incoherent rays from a shell looking inward (the
  round-2 reference point: VMEM kernel 10.8M rays/s);
- mixed: shell rays with best-t seeds tightened to a nearby-hit distribution
  (approximates mid-render traffic where most lanes already found geometry).

Usage: /opt/venv/bin/python tools/probe_tri_kernel.py [hbm] [bigmesh]

bigmesh swaps scene 6's 16.6k-tri table for the 318k-tri subdivided bunny
(the bench bigmesh config) so the HBM kernel's phase costs can be isolated on
the population the roofline blames (sqn~22 incoherent): combine with the
TPUPT_TRI_STUB / TPUPT_TRI_NOMT substitutions to split preamble | phases 1-2 |
phase 3+DMA.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from tpupt.scenes import everything_scene
from tpupt.ops.pallas_tri import pallas_closest_tri

hbm = "hbm" in sys.argv[1:]

if "bigmesh" in sys.argv[1:]:
    from tpupt.io.obj import load_obj, subdivide_mesh
    from tpupt.scene.builder import Diffuse, Scene

    scene = Scene()
    mesh = subdivide_mesh(load_obj("/root/reference/assets/bunny.obj"), 3)
    scene.add_mesh(mesh, Diffuse((0.7, 0.7, 0.7)), scale=20.0)
    scene.environment = (1.0, 1.0, 1.0)
    sd = scene.compile().data
else:
    scene, cam = everything_scene(64, 8)
    sd = scene.compile().data
print(f"# tris={sd.tri_v0.shape[0]} clusters={sd.tri_cl.shape[0]}", flush=True)

B = 256 * 1024
rng = np.random.default_rng(0)
# scene 6 bounds roughly [-6,6]^3 around origin (walls at +-~5)
o = rng.normal(size=(B, 3)).astype(np.float32)
o = 5.0 * o / np.linalg.norm(o, axis=1, keepdims=True)
d = rng.normal(size=(B, 3)).astype(np.float32)
d = d / np.linalg.norm(d, axis=1, keepdims=True)
o_j, d_j = jnp.asarray(o), jnp.asarray(d)

fn = jax.jit(lambda o, d, t: pallas_closest_tri(sd, o, d, t, 1e-3, hbm=hbm)[0])

for name, t_in in [
    ("worst(seed=BIG)", jnp.full((B,), 3e38, jnp.float32)),
    ("seeded(t=2)", jnp.full((B,), 2.0, jnp.float32)),
]:
    t = fn(o_j, d_j, t_in)
    t.block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        t = fn(o_j, d_j, t_in)
    t.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {B / dt / 1e6:.2f}M rays/s  ({dt*1e3:.2f} ms)", flush=True)

"""tpupt — a TPU-native differentiable path tracer built from scratch in JAX.

Re-designs (not ports) the capabilities of the Rust CPU reference
``chiefchewie/thu-acg-f2024-path-tracer`` for TPU hardware:

- scene graphs are compiled ahead of time into SoA jnp arrays
  (vs reference ``Arc<dyn Hittable>`` heaps, hittable/list.rs:10),
- all randomness is a counter-based stateless sampler
  (vs ~20 ambient ``thread_rng()`` sites, e.g. camera.rs:134),
- the integrator is a masked, shape-static wavefront loop under ``jit``
  (vs per-pixel recursion + rayon, camera.rs:102,170),
- parallelism is SPMD over a ``jax.sharding.Mesh``
  (vs rayon work-stealing threads).

Layout:
    core/      math, RNG, constants           (reference L0: vec3.rs, ray.rs, utils.rs)
    scene/     builder API + scene compiler   (reference L5 scene graphs -> SoA IR)
    ops/       intersect/BSDF/texture kernels (reference L1-L3 hot loops)
    render/    camera, integrator, film       (reference L4: camera.rs)
    parallel/  mesh + pod sharding of the sample axis (reference: rayon pixel loop)
    io/        OBJ + image asset loading      (reference: tobj/image crates)
    native/    C++ runtime (OBJ parse, BVH build) via ctypes
"""

__version__ = "0.1.0"

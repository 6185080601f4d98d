"""Counter-based stateless sampler.

The reference calls ``rand::thread_rng()`` ambiently at ~20 sites (camera.rs:134,166,192;
bsdf/sampling.rs:19,79-80,128-129; glass.rs:80; principled.rs:267; hittable/list.rs:82;
sphere.rs:111-112; quad.rs:81-82; mesh.rs:123-124) with no seed and scheduler-dependent
streams. A TPU design needs the opposite: every draw is a pure function of
``(seed, pixel, sample, counter)`` so that

- the whole wavefront vectorizes (no sequential RNG state),
- forward/backward/oracle runs agree bit-for-bit (path replay for the
  differentiable pass re-derives identical decisions), and
- resuming a render at sample k is exact.

The hash is PCG4D [Jarzynski & Olano, JCGT 2020, "Hash Functions for GPU Rendering"]:
4 x uint32 in, 4 x uint32 out, well-distributed, ~20 integer VPU ops — far cheaper on
TPU than threading `jax.random` keys through a `lax.while_loop`.

Draw-site counter map (one PCG4D call yields 4 independent uniforms):

    CTR_CAMERA    -> (aa_r, aa_theta, dof_r, dof_theta)      camera.rs:133-137,153-164
    CTR_TIME      -> (time, _, _, _)                         camera.rs:166
    bounce_ctr(b)+SLOT_CTRL   -> (rr_u, mis_r, light_pick, lobe_r)
    bounce_ctr(b)+SLOT_BSDF   -> (e1, e2, fresnel_u, _)      sampling.rs:79-80, glass.rs:80
    bounce_ctr(b)+SLOT_LIGHT  -> (u, v, _, _)                quad.rs:81-82, sphere.rs:111-112
"""

from __future__ import annotations

import jax.numpy as jnp
from .dtypes import REAL

# Counter-space layout. Camera draws live below BOUNCE_BASE; each bounce owns
# SLOTS_PER_BOUNCE consecutive counters.
CTR_CAMERA = 0
CTR_TIME = 1
BOUNCE_BASE = 8
SLOTS_PER_BOUNCE = 4
SLOT_CTRL = 0
SLOT_BSDF = 1
SLOT_LIGHT = 2


def bounce_ctr(bounce):
    """First counter owned by bounce `bounce` (int or traced int32)."""
    return BOUNCE_BASE + bounce * SLOTS_PER_BOUNCE


def _pcg4d(a, b, c, d):
    """PCG4D hash: four uint32 arrays -> four uint32 arrays (elementwise)."""
    u32 = jnp.uint32
    a = a.astype(u32)
    b = b.astype(u32)
    c = c.astype(u32)
    d = d.astype(u32)
    mul = u32(1664525)
    inc = u32(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit_float(u):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (u >> jnp.uint32(8)).astype(REAL) * REAL(1.0 / (1 << 24))


def uniform4(seed, pixel, sample, ctr):
    """Four independent uniforms in [0,1) for each element.

    Args:
      seed:   scalar or array uint32 — global stream id.
      pixel:  array int/uint32 — flattened pixel index.
      sample: array int/uint32 — sample-within-pixel index.
      ctr:    scalar or array int/uint32 — draw-site counter (see module docstring).

    Returns: tuple of 4 float32 arrays broadcast to the common shape.
    """
    a, b, c, d = _pcg4d(
        jnp.asarray(pixel), jnp.asarray(sample), jnp.asarray(ctr), jnp.asarray(seed)
    )
    return (_to_unit_float(a), _to_unit_float(b), _to_unit_float(c), _to_unit_float(d))


def uniform(seed, pixel, sample, ctr):
    """One uniform in [0,1) per element."""
    return uniform4(seed, pixel, sample, ctr)[0]

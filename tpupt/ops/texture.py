"""Branchless texture evaluation over the interned texture table.

Replaces the reference's ``Arc<dyn Texture>`` virtual dispatch (texture.rs:7-9) with
gather + select over SoA rows: checker nodes resolve to a child id by world-position
parity (texture.rs:43-54), then solid/image leaves evaluate in one pass. Checker
nesting is one level deep (all reference scenes use solid children).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene import data as D


def _image_lookup(sd, tid, u, v):
    """Nearest-neighbor atlas lookup (texture.rs:73-91): u clamped, v flipped."""
    img = sd.tex_img[tid]  # [...,3] (offset, w, h)
    offset, w, h = img[..., 0], img[..., 1], img[..., 2]
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    # Rust: (u * width) as u32 — truncation; clamp to the last texel to avoid the
    # u==1.0 edge (which would panic in the reference)
    i = jnp.minimum(jnp.floor(uu * w.astype(jnp.float32)).astype(jnp.int32), w - 1)
    j = jnp.minimum(jnp.floor(vv * h.astype(jnp.float32)).astype(jnp.int32), h - 1)
    idx = offset + j * w + i
    # atlas stores Rgb8; scale at lookup like the reference (texture.rs:84-90)
    return sd.atlas[idx].astype(jnp.float32) * jnp.float32(1.0 / 255.0)


def eval_texture(sd: "D.SceneData", tid, u, v, point):
    """Evaluate color texture `tid` at (u, v, world point) -> [..., 3] float32.

    `tid` may contain -1 (unused slots); those lanes return 0 and must be masked
    by the caller.
    """
    tid = jnp.maximum(tid, 0)

    # resolve checker -> child (texture.rs:44-53). Parity test matches Rust's
    # `(x+y+z) % 2 == 0`: for odd sums Rust yields ±1 and jnp yields 1 — both != 0.
    inv_scale = sd.tex_inv_scale[tid]
    cell = jnp.floor(point * inv_scale[..., None]).astype(jnp.int32)
    parity_even = (cell.sum(axis=-1) % 2) == 0
    child = jnp.where(parity_even, sd.tex_child[tid, 0], sd.tex_child[tid, 1])
    rid = jnp.where(sd.tex_type[tid] == D.TEX_CHECKER, jnp.maximum(child, 0), tid)

    solid = sd.tex_rgb[rid]
    image = _image_lookup(sd, rid, u, v)
    return jnp.where((sd.tex_type[rid] == D.TEX_IMAGE)[..., None], image, solid)


def eval_scalar_texture(sd, tid, u, v, point):
    """Scalar texture (reference Texture<f64>, e.g. roughness): red channel."""
    return eval_texture(sd, tid, u, v, point)[..., 0]

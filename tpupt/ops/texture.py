"""Branchless texture evaluation over the interned texture table.

Replaces the reference's ``Arc<dyn Texture>`` virtual dispatch (texture.rs:7-9) with
row selection over SoA tables: checker nodes resolve to a child id by world-position
parity (texture.rs:43-54), then solid/image leaves evaluate in one pass. Checker
nesting is one level deep (all reference scenes use solid children).

Small-table row fetches go through ops.gather.take_rows (one-hot matmul on the MXU);
only the image-atlas lookup is a true per-lane gather.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene import data as D
from .gather import take_rows
from ..core.dtypes import REAL


def _tex_rows(sd, tid):
    """Fetch [type, rgb0..2, inv_scale, child0, child1, img0..2] rows for tid [B]."""
    table = jnp.concatenate(
        [
            sd.tex_type.astype(REAL)[:, None],
            sd.tex_rgb,
            sd.tex_inv_scale[:, None],
            sd.tex_child.astype(REAL),
            sd.tex_img.astype(REAL),
        ],
        axis=1,
    )
    return take_rows(table, tid)


def _image_lookup(sd, offset, w, h, u, v):
    """Nearest-neighbor atlas lookup (texture.rs:73-91): u clamped, v flipped."""
    uu = jnp.clip(u, 0.0, 1.0)
    vv = 1.0 - jnp.clip(v, 0.0, 1.0)
    # Rust: (u * width) as u32 — truncation; clamp to the last texel to avoid the
    # u==1.0 edge (which would panic in the reference)
    i = jnp.minimum(jnp.floor(uu * w).astype(jnp.int32), w.astype(jnp.int32) - 1)
    j = jnp.minimum(jnp.floor(vv * h).astype(jnp.int32), h.astype(jnp.int32) - 1)
    idx = offset.astype(jnp.int32) + j * w.astype(jnp.int32) + i
    # atlas texels are u8-quantized at load (texture.rs:63-68) but stored f32:
    # the gather is differentiable (scatter-add adjoint -> per-texel gradients)
    return jnp.take(sd.atlas, idx, axis=0)


def eval_texture(sd: "D.SceneData", tid, u, v, point):
    """Evaluate color texture `tid` at (u, v, world point) -> [..., 3] float32.

    `tid` may contain -1 (unused slots); those lanes return 0 and must be masked
    by the caller.
    """
    tid = jnp.maximum(tid, 0)
    rows = _tex_rows(sd, tid)

    if sd.has_checker:
        ttype = rows[..., 0].astype(jnp.int32)
        # resolve checker -> child (texture.rs:44-53). Parity test matches
        # Rust's `(x+y+z) % 2 == 0`: for odd sums Rust yields +-1 and jnp
        # yields 1 — both != 0. Checker-free scenes compile this block (a
        # second row gather + cell math) out entirely (round 5).
        inv_scale = rows[..., 4]
        px, py, pz = point[..., 0], point[..., 1], point[..., 2]
        cell = (
            jnp.floor(px * inv_scale).astype(jnp.int32)
            + jnp.floor(py * inv_scale).astype(jnp.int32)
            + jnp.floor(pz * inv_scale).astype(jnp.int32)
        )
        parity_even = (cell % 2) == 0
        child = jnp.where(parity_even, rows[..., 5], rows[..., 6]).astype(jnp.int32)
        is_checker = ttype == D.TEX_CHECKER
        rid = jnp.where(is_checker, jnp.maximum(child, 0), tid)

        rrows = jnp.where(
            is_checker[..., None], _tex_rows(sd, jnp.maximum(child, 0)), rows
        )
    else:
        rid = tid
        rrows = rows
    rtype = rrows[..., 0].astype(jnp.int32)
    solid = rrows[..., 1:4]
    if sd.has_image_textures:
        image = _image_lookup(sd, rrows[..., 7], rrows[..., 8], rrows[..., 9], u, v)
        return jnp.where((rtype == D.TEX_IMAGE)[..., None], image, solid)
    del rid
    return solid


def eval_scalar_texture(sd, tid, u, v, point):
    """Scalar texture (reference Texture<f64>, e.g. roughness): red channel."""
    return eval_texture(sd, tid, u, v, point)[..., 0]

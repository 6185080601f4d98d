"""Environment lighting: constant color, reference-parity LDR map, or HDR map + IS.

The reference supports EnvironmentType::{Color, Map} (camera.rs:16-19) and looks the
map up only on ray miss (camera.rs:140-151), quantizing .hdr files to u8 on load
(texture.rs:63-68). This module reproduces both, and adds the new-design capability
from the BASELINE.json north star: a full-precision f32 HDR environment with
*importance sampling* — the env becomes a light in the NEE/MIS mixture, sampled in
O(1) per lane via a Vose alias table over luminance*sin(theta) texel weights.

Mapping (matches sample_environment / camera.rs:144-149):
    theta = arccos(d.y)            v = 1 - theta/pi
    phi   = atan2(d.z, d.x)        u = (phi + pi) / (2 pi)
so row j covers theta in [j pi/H, (j+1) pi/H] and col i covers phi in
[-pi + 2 pi i/W, ...]. A texel's solid angle is (2 pi/W)(pi/H) sin(theta_j).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .texture import eval_texture
from ..core.dtypes import NP_REAL, REAL, NP_REAL

PI = NP_REAL(jnp.pi)


def _texel_from_dir(sd, direction):
    """Direction [B,3] -> (texel index [B], row j, col i) of the HDR env map."""
    w = sd.env_wh[0]
    h = sd.env_wh[1]
    theta = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(direction[..., 2], direction[..., 0])
    u = (phi + PI) / (2.0 * PI)
    vv = theta / PI  # == 1 - v, the flipped row coordinate of the lookup
    i = jnp.clip(jnp.floor(u * w).astype(jnp.int32), 0, w - 1)
    j = jnp.clip(jnp.floor(vv * h).astype(jnp.int32), 0, h - 1)
    return j * w + i, j, i


def sample_environment(sd, direction):
    """Radiance along a miss ray -> [B,3]."""
    if sd.env_is_hdr:
        texel, _, _ = _texel_from_dir(sd, direction)
        return jnp.take(sd.env_img, texel, axis=0)
    if not sd.env_is_map:
        return jnp.broadcast_to(sd.env_color, direction.shape)
    theta = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(direction[..., 2], direction[..., 0])
    u = (phi + PI) / (2.0 * PI)
    v = 1.0 - theta / PI
    return eval_texture(sd, jnp.broadcast_to(sd.env_tex, u.shape), u, v, direction)


def sample_env_light(sd, u1, u2):
    """Importance-sample a direction from the HDR env -> ([B] x,y,z component tuple).

    Alias-table draw: u1 picks the texel slot, u2 the accept/alias coin; the
    direction is the texel center. O(1) per lane (two gathers), no CDF search.
    """
    n = sd.env_alias.shape[0]
    slot = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    prob = jnp.take(sd.env_prob, slot, axis=0)
    alias = jnp.take(sd.env_alias, slot, axis=0)
    texel = jnp.where(u2 < prob, slot, alias)

    w = sd.env_wh[0]
    h = sd.env_wh[1]
    j = texel // w
    i = texel % w
    theta = (j.astype(REAL) + 0.5) / h * PI
    phi = (i.astype(REAL) + 0.5) / w * (2.0 * PI) - PI
    st = jnp.sin(theta)
    return (st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi))


def pdf_env_light(sd, direction):
    """Solid-angle pdf of sample_env_light for `direction` [B,3] -> [B]."""
    texel, _, _ = _texel_from_dir(sd, direction)
    return jnp.take(sd.env_pdf, texel, axis=0)


def build_env_tables(img: np.ndarray):
    """Host-side: f32 [H,W,3] env map -> (alias [N] i32, prob [N] f32, pdf [N] f32).

    Texel weights are luminance * sin(theta_row) (the equirect area element);
    pdf is the solid-angle density w/(integral * texel_solid_angle). Alias table
    built with Vose's O(N) algorithm.
    """
    h, w = img.shape[:2]
    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    sin_t = np.sin((np.arange(h, dtype=np.float64) + 0.5) / h * np.pi)
    wgt = np.maximum(lum.astype(np.float64), 0.0) * sin_t[:, None]
    flat = wgt.reshape(-1)
    total = flat.sum()
    if total <= 0.0:
        flat = np.ones_like(flat)
        total = flat.sum()
    p = flat / total  # texel selection probabilities
    n = p.size

    # solid-angle pdf per texel: p / omega, omega = (2pi/w)(pi/h) sin(theta)
    omega = (2.0 * np.pi / w) * (np.pi / h) * np.repeat(sin_t, w)
    pdf = p / np.maximum(omega, 1e-12)

    # Vose alias method
    scaled = p * n
    alias = np.zeros(n, dtype=np.int32)
    prob = np.ones(n, dtype=np.float64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    scaled = scaled.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0

    return alias, prob.astype(NP_REAL), pdf.astype(NP_REAL)

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


def _use_fast_trig() -> bool:
    """Polynomial atan2/arccos for the equirect mapping. Default OFF.

    Built for the round-5 envmap investigation: the NOTRIG probe control
    (tools/probe_lights.py) suggested ~20 ns/ray of transcendental cost, but
    the interleaved on-chip A/B (BASELINE.md round 5) measured the polynomial
    variant WITHIN NOISE of libm — the apparent trig cost was chip drift, and
    the env leg is bound by the gather's fusion break, not the VPU. Kept
    behind TPUPT_FAST_TRIG=1 for future A/Bs on VPU-bound configs; max error
    ~1.9e-6 rad flips ~0.018% of lookups to the adjacent texel (the same
    boundary class where our f32 trig already deviates from the reference's
    f64).
    """
    import os

    return os.environ.get("TPUPT_FAST_TRIG", "0") == "1"


def _fast_atan2(y, x):
    """Minimax polynomial atan2 (f32, ~1e-6 rad max err), branch-free.

    Octant reduction: a = min|.|/max|.| in [0,1], odd polynomial in a, then
    quadrant fix-ups by select. Signed-zero/inf edge cases fall on measure-zero
    direction sets and resolve to finite angles (no NaNs for unit directions).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.where(hi > 0.0, hi, 1.0)
    s = a * a
    # Estrin-friendly odd minimax on [0,1] (Cephes-class coefficients)
    r = a * (
        0.99997726
        + s
        * (
            -0.33262347
            + s * (0.19354346 + s * (-0.11643287 + s * (0.05265332 + s * -0.01172120)))
        )
    )
    r = jnp.where(ay > ax, NP_REAL(0.5 * jnp.pi) - r, r)
    r = jnp.where(x < 0.0, PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _fast_arccos(x):
    """arccos via the fast atan2: acos(x) = atan2(sqrt(1-x^2), x)."""
    return _fast_atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def _dir_to_theta_phi(direction):
    """Direction [B,3] -> (theta, phi) of the equirect mapping (camera.rs:144-149)."""
    y = jnp.clip(direction[..., 1], -1.0, 1.0)
    if _use_fast_trig():
        return _fast_arccos(y), _fast_atan2(direction[..., 2], direction[..., 0])
    return jnp.arccos(y), jnp.arctan2(direction[..., 2], direction[..., 0])


def _texel_from_dir(sd, direction):
    """Direction [B,3] -> (texel index [B], row j, col i) of the HDR env map."""
    w = sd.env_wh[0]
    h = sd.env_wh[1]
    theta, phi = _dir_to_theta_phi(direction)
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
    theta, phi = _dir_to_theta_phi(direction)
    u = (phi + PI) / (2.0 * PI)
    v = 1.0 - theta / PI
    if sd.env_map_w > 0:
        # static fast path (round 5): the env is one plain ImageTexture whose
        # atlas coordinates are compile-time constants, so the lookup is ONE
        # atlas row gather. IEEE-identical to the generic path below: the
        # arithmetic is _image_lookup's (texture.rs:73-91 — u clamped, v
        # flipped, truncating floor, last-texel clamp) with the same f32
        # w/h values, only the texture-table indirection and checker resolve
        # (a second row gather + selects — measured 59% of the lights render,
        # tools/probe_lights.py) compiled out. Gathering from sd.atlas (the
        # differentiable leaf) keeps env texel gradients flowing.
        w = REAL(sd.env_map_w)
        h = REAL(sd.env_map_h)
        uu = jnp.clip(u, 0.0, 1.0)
        vv = 1.0 - jnp.clip(v, 0.0, 1.0)
        i = jnp.minimum(jnp.floor(uu * w).astype(jnp.int32), sd.env_map_w - 1)
        j = jnp.minimum(jnp.floor(vv * h).astype(jnp.int32), sd.env_map_h - 1)
        idx = sd.env_map_off + j * sd.env_map_w + i
        return jnp.take(sd.atlas, idx, axis=0)
    return eval_texture(sd, jnp.broadcast_to(sd.env_tex, u.shape), u, v, direction)


def sample_env_light(sd, u1, u2):
    """Importance-sample a direction from the HDR env -> ([B] x,y,z component tuple).

    Alias-table draw: u1 picks the texel slot, u2 the accept/alias coin; the
    direction is the texel center. O(1) per lane (ONE row gather of the packed
    (prob, alias, pdf) table — TPU gathers cost ~5-8 ns/lane per OP regardless
    of row width, so packing the two 1-D lookups into env_sam halves the cost;
    tools/probe_gather.py round 5), no CDF search.
    """
    n = sd.env_sam.shape[0]
    slot = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    row = jnp.take(sd.env_sam, slot, axis=0)
    prob = row[..., 0]
    alias = row[..., 1].astype(jnp.int32)  # f32-exact: n < 2^24 (compile assert)
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
    """Solid-angle pdf of sample_env_light for `direction` [B,3] -> [B].

    Reads the pdf column of the packed env_sam rows: a 3-wide row gather is
    the same ~5 ns/lane as any gather op, and sharing the table with
    sample_env_light keeps one copy hot (tools/probe_gather.py round 5).
    """
    texel, _, _ = _texel_from_dir(sd, direction)
    return jnp.take(sd.env_sam, texel, axis=0)[..., 2]


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

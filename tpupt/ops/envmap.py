"""Environment lighting (camera.rs:140-151): constant color or equirect map lookup.

Statically specialized: constant-environment scenes compile to a broadcast, map
scenes to the equirect transform + atlas lookup.
"""

from __future__ import annotations

import jax.numpy as jnp

from .texture import eval_texture

PI = jnp.float32(jnp.pi)


def sample_environment(sd, direction):
    """Radiance along a miss ray -> [B,3]."""
    if not sd.env_is_map:
        return jnp.broadcast_to(sd.env_color, direction.shape)
    theta = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(direction[..., 2], direction[..., 0])
    u = (phi + PI) / (2.0 * PI)
    v = 1.0 - theta / PI
    return eval_texture(sd, jnp.broadcast_to(sd.env_tex, u.shape), u, v, direction)

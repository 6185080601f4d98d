"""Vectorized 3D math over ``[..., 3]`` float32 arrays.

TPU-native replacement for the reference's scalar ``glam::DVec3`` layer (vec3.rs:3-6).
Every helper is shape-polymorphic and jit/vmap/grad-safe; the last axis is xyz.

Precision note: the reference computes in f64; TPUs are f32-native (f64 is emulated and
slow), so all device math here is f32 and the CPU oracle runs the same code under
``jax.enable_x64`` (see SURVEY.md section 7, decision 1).
"""

from __future__ import annotations

import jax.numpy as jnp
from .dtypes import NP_REAL, REAL

EPS_OFFSET = 1e-3  # ray-origin offset along the geometric normal (bsdf/mod.rs:19)
T_MIN = 1e-3  # minimum hit distance (camera.rs:171,179)
# numpy (host) scalar: a jnp scalar here would initialize the XLA backend at
# import time, breaking jax.distributed.initialize on pods (tests/test_multiprocess.py)
BIG = NP_REAL(3.0e38)  # stand-in for +inf distances (keeps f32 arithmetic finite)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot_keep(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length_sq(a))


def normalize(a, eps=0.0):
    """a / |a|. With eps=0 matches glam's normalize (inf/nan on zero vectors)."""
    n2 = length_sq(a)[..., None]
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a / jnp.sqrt(n2)


def safe_normalize(a):
    """Normalize; zero vectors map to zero (used where the reference can't produce them)."""
    n2 = length_sq(a)[..., None]
    return jnp.where(n2 > 0, a / jnp.sqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)


def reflect(i, n):
    """glam reflect: i - 2*dot(i,n)*n."""
    return i - 2.0 * dot_keep(i, n) * n


def refract(i, n, eta):
    """glam/GLSL refract; returns 0 on total internal reflection (glam DVec3::refract).

    i must be normalized; eta is per-lane scalar [...]. TIR iff k < 0.
    """
    eta = jnp.asarray(eta)[..., None]
    ni = dot_keep(n, i)
    k = 1.0 - eta * eta * (1.0 - ni * ni)
    t = eta * i - (eta * ni + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k >= 0.0, t, 0.0)


def luminance(c):
    """Rec.709 luma (vec3.rs:40-44)."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def vec(x, y, z, dtype=REAL):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1
    )


# ---------------------------------------------------------------------------
# Shading frame: quaternion that rotates the normal onto +z (vec3.rs:23-29).
# The reference builds glam quats; we inline the equivalent rotation as pure
# vector math so XLA can fuse it into the shading kernel.
# ---------------------------------------------------------------------------


def _quat_to_z(n):
    """Quaternion (x,y,z,w) rotating vector n to +z, matching get_rotation_to_z.

    Normal case: q = normalize(n.y, -n.x, 0, 1+n.z).
    Degenerate (n.z < -0.99999): q = (1,0,0,0), a 180-degree flip about x.
    """
    x = n[..., 1]
    y = -n[..., 0]
    z = jnp.zeros_like(x)
    w = 1.0 + n[..., 2]
    norm = jnp.sqrt(x * x + y * y + w * w)
    degenerate = n[..., 2] < -0.99999
    safe = jnp.maximum(norm, 1e-20)
    qx = jnp.where(degenerate, 1.0, x / safe)
    qy = jnp.where(degenerate, 0.0, y / safe)
    qz = jnp.where(degenerate, 0.0, z)
    qw = jnp.where(degenerate, 0.0, w / safe)
    return qx, qy, qz, qw


def _quat_rotate(qx, qy, qz, qw, v):
    """Rotate v by unit quaternion q: v + 2*qv x (qv x v + w*v)."""
    qv = jnp.stack([qx, qy, qz], axis=-1)
    t = cross(qv, v) + qw[..., None] * v
    return v + 2.0 * cross(qv, t)


def to_local(normal, v_world):
    """World -> shading-local frame where `normal` is +z (sampling.rs:8-11)."""
    qx, qy, qz, qw = _quat_to_z(normal)
    return _quat_rotate(qx, qy, qz, qw, v_world)


def to_world(normal, v_local):
    """Shading-local -> world (sampling.rs:13-16): rotate by the conjugate."""
    qx, qy, qz, qw = _quat_to_z(normal)
    return _quat_rotate(-qx, -qy, -qz, qw, v_local)


# ---------------------------------------------------------------------------
# Component (SoA) forms: 3-tuples of [B] arrays. These are the TPU-fast paths —
# intermediates stay [B]-shaped so the batch rides the full 128-lane axis
# (a [B,3] array pads its minor dim 3 up to 128 lanes and wastes 97% of them).
# ---------------------------------------------------------------------------


def unpack3(v):
    """[B,3] -> ( [B], [B], [B] )."""
    return v[..., 0], v[..., 1], v[..., 2]


def pack3(t):
    return jnp.stack(t, axis=-1)


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def neg3(a):
    return (-a[0], -a[1], -a[2])


def where3(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def normalize3(a, eps=0.0):
    n2 = dot3(a, a)
    if eps:
        # floor at 1e-24: rsqrt's local derivative at smaller floors overflows f32
        # and mints 0*inf = NaN in reverse-mode AD on masked lanes (render/diff.py)
        n2 = jnp.maximum(n2, max(eps, 1e-24))
    inv = 1.0 / jnp.sqrt(n2)
    return scale3(a, inv)


def reflect3(i, n):
    """glam reflect: i - 2*dot(i,n)*n."""
    k = 2.0 * dot3(i, n)
    return (i[0] - k * n[0], i[1] - k * n[1], i[2] - k * n[2])


def refract3(i, n, eta):
    """glam/GLSL refract; 0 on TIR. i normalized, eta per-lane [B]."""
    ni = dot3(n, i)
    k = 1.0 - eta * eta * (1.0 - ni * ni)
    coef = eta * ni + jnp.sqrt(jnp.maximum(k, 1e-20))  # floor: see normalize3 note
    ok = k >= 0.0
    return (
        jnp.where(ok, eta * i[0] - coef * n[0], 0.0),
        jnp.where(ok, eta * i[1] - coef * n[1], 0.0),
        jnp.where(ok, eta * i[2] - coef * n[2], 0.0),
    )


def _quat_to_z3(n):
    x = n[1]
    y = -n[0]
    w = 1.0 + n[2]
    # sqrt floored: n == (0,0,-1) hits norm == 0 exactly; the degenerate `where`
    # masks the value but not reverse-mode AD's 0 * inf (render/diff.py)
    norm = jnp.sqrt(jnp.maximum(x * x + y * y + w * w, 1e-24))
    degenerate = n[2] < -0.99999
    safe = jnp.maximum(norm, 1e-20)
    qx = jnp.where(degenerate, 1.0, x / safe)
    qy = jnp.where(degenerate, 0.0, y / safe)
    qw = jnp.where(degenerate, 0.0, w / safe)
    return qx, qy, qw  # qz is identically 0 in both branches


def _quat_rotate3(qx, qy, qw, v):
    """Rotate v by unit quaternion (qx, qy, 0, qw): v + 2 q x (q x v + w v)."""
    q = (qx, qy, jnp.zeros_like(qx))
    t = add3(cross3(q, v), scale3(v, qw))
    return add3(v, scale3(cross3(q, t), 2.0))


def to_local3(n, v):
    """World -> local (normal = +z), component form of to_local."""
    qx, qy, qw = _quat_to_z3(n)
    return _quat_rotate3(qx, qy, qw, v)


def to_world3(n, v):
    """Local -> world, component form of to_world."""
    qx, qy, qw = _quat_to_z3(n)
    return _quat_rotate3(-qx, -qy, qw, v)

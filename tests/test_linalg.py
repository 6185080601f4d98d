"""Vector math: frame transforms vs the reference's quaternion construction."""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.core import linalg as la

_to_local = jax.jit(la.to_local)
_to_world = jax.jit(la.to_world)


def _rand_unit(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_to_local_maps_normal_to_z():
    n = jnp.asarray(_rand_unit(256, 1), jnp.float32)
    local = np.asarray(_to_local(n, n))
    np.testing.assert_allclose(local[:, 2], 1.0, atol=1e-5)
    np.testing.assert_allclose(local[:, :2], 0.0, atol=1e-5)


def test_to_world_inverse_of_to_local():
    n = jnp.asarray(_rand_unit(256, 2), jnp.float32)
    v = jnp.asarray(_rand_unit(256, 3), jnp.float32)
    back = np.asarray(_to_world(n, _to_local(n, v)))
    np.testing.assert_allclose(back, np.asarray(v), atol=1e-5)


def test_to_local_preserves_dot():
    """Rotation: angles between vectors preserved."""
    n = jnp.asarray(_rand_unit(128, 4), jnp.float32)
    a = jnp.asarray(_rand_unit(128, 5), jnp.float32)
    b = jnp.asarray(_rand_unit(128, 6), jnp.float32)
    d0 = np.asarray(la.dot(a, b))
    d1 = np.asarray(la.dot(_to_local(n, a), _to_local(n, b)))
    np.testing.assert_allclose(d0, d1, atol=1e-5)


def test_degenerate_down_normal():
    """vec3.rs:24-25: n.z < -0.99999 uses the 180-degree x flip."""
    n = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    v = jnp.asarray([[0.3, 0.4, -0.5]], jnp.float32)
    local = np.asarray(_to_local(n, v))
    # q=(1,0,0,0): rotate 180 about x: (x, -y, -z)
    np.testing.assert_allclose(local, [[0.3, -0.4, 0.5]], atol=1e-6)


def test_reflect():
    i = jnp.asarray([[1.0, -1.0, 0.0]], jnp.float32) / np.sqrt(2)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    out = np.asarray(la.reflect(i, n))
    np.testing.assert_allclose(out, np.asarray([[1.0, 1.0, 0.0]]) / np.sqrt(2), atol=1e-6)


def test_refract_tir_returns_zero():
    """glam refract: k < 0 -> Vec3::ZERO (drives glass.rs:85-87 fallback)."""
    i = jnp.asarray([[0.99, -np.sqrt(1 - 0.99**2), 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    out = np.asarray(la.refract(i, n, jnp.asarray([1.5], jnp.float32)))
    np.testing.assert_allclose(out, 0.0)


def test_refract_matches_snell():
    i = jnp.asarray([[np.sin(0.5), -np.cos(0.5), 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    eta = 1.0 / 1.5
    out = np.asarray(la.refract(i, n, jnp.asarray([eta], jnp.float32)))[0]
    sin_out = np.hypot(out[0], out[2])
    np.testing.assert_allclose(sin_out, eta * np.sin(0.5), atol=1e-6)
    assert out[1] < 0  # transmitted into the surface
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)


def test_luminance():
    c = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 0.0, 0.0]], jnp.float32)
    lum = np.asarray(la.luminance(c))
    np.testing.assert_allclose(lum, [1.0, 0.2126], atol=1e-6)

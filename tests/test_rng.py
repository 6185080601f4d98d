"""Counter-based sampler: distribution + decorrelation."""

import jax.numpy as jnp
import numpy as np

from tpupt.core import rng


def test_uniform_range_and_moments():
    n = 1 << 16
    pix = jnp.arange(n, dtype=jnp.uint32)
    u = np.asarray(rng.uniform(0, pix, 0, 0))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 5e-3
    assert abs(u.var() - 1.0 / 12.0) < 5e-3


def test_counters_decorrelated():
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    a = np.asarray(rng.uniform(0, pix, 0, 3))
    b = np.asarray(rng.uniform(0, pix, 0, 4))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.02


def test_lanes_decorrelated():
    n = 1 << 14
    pix = jnp.arange(n, dtype=jnp.uint32)
    u = rng.uniform4(0, pix, 7, 11)
    m = np.stack([np.asarray(x) for x in u])
    c = np.corrcoef(m)
    off_diag = c[~np.eye(4, dtype=bool)]
    assert np.abs(off_diag).max() < 0.02


def test_seed_changes_stream():
    n = 1 << 12
    pix = jnp.arange(n, dtype=jnp.uint32)
    a = np.asarray(rng.uniform(0, pix, 0, 0))
    b = np.asarray(rng.uniform(1, pix, 0, 0))
    assert not np.allclose(a, b)


def test_deterministic():
    pix = jnp.arange(128, dtype=jnp.uint32)
    a = np.asarray(rng.uniform(5, pix, 9, 2))
    b = np.asarray(rng.uniform(5, pix, 9, 2))
    np.testing.assert_array_equal(a, b)

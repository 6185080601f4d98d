"""Regression guard for jax.jacrev through the checkpointed scan integrator.

Round 1 observed jacrev's vmapped VJP rows coming out up to ~3% off vs
single-cotangent jax.vjp rows through `trace_radiance_scan` (jax 0.9 CPU), and
BASELINE.md told users to avoid jacrev. Round 2 could NOT reproduce the
discrepancy — jacrev rows now match row-by-row VJPs exactly on scenes covering
diffuse, glass, principled and emissive materials. This test pins that down: if
the mismatch ever comes back (jax upgrade, new bounce math), it fails loudly
instead of silently mis-reporting Jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpupt.render.camera import Camera
from tpupt.render.diff import init_params, make_pixel_fn
from tpupt.scene.builder import Diffuse, Glass, Light, Principled, Scene

import pytest

pytestmark = pytest.mark.slow  # multi-minute lane (pytest.ini)


def test_jacrev_matches_row_vjps():
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Principled((0.6, 0.4, 0.3), metallic=0.3, roughness=0.4))
    s.add_sphere(0.6, (-1.2, 0.3, -2.5), Glass((0.9, 0.9, 0.9), 0.1, 1.5))
    s.add_quad((-3, -1.5, -6), (6, 0, 0), (0, 0, 6), Diffuse((0.5, 0.5, 0.5)))
    s.add_sphere(0.4, (1.5, 1.5, -2.5), Light((5.0, 5.0, 5.0)), light=True)
    s.environment = (0.2, 0.3, 0.4)
    compiled = s.compile()
    cam = Camera(
        aspect_ratio=1.0, image_width=4, samples_per_pixel=4, max_depth=6,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )
    fn = make_pixel_fn(compiled, cam)
    params = init_params(compiled.data)
    pix = jnp.arange(4, dtype=jnp.int32)
    args = (pix, pix // 4, pix % 4, jnp.zeros(4, jnp.int32), jnp.uint32(3))

    def g(p):
        return fn(p, *args).reshape(-1)

    y = g(params)
    n = y.shape[0]
    j_rev = jax.jacrev(g)(params)
    _, vjp = jax.vjp(g, params)
    for key in j_rev:
        rows = [vjp(jnp.zeros(n).at[i].set(1.0))[0][key] for i in range(n)]
        j_vjp = jnp.stack(rows).reshape(n, -1)
        jr = j_rev[key].reshape(n, -1)
        denom = float(jnp.abs(j_vjp).max()) + 1e-30
        err = float(jnp.abs(jr - j_vjp).max()) / denom
        assert err < 1e-6, (key, err)

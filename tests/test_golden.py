"""Golden-image regression tests: all 7 reference scenes vs committed CPU renders.

The reference's only quality signal is its committed demo PNGs (SURVEY.md section 4);
these goldens are the framework's equivalent, but in linear f32 radiance and
bit-compared on the same backend. Any estimator change — intersection order, BSDF
math, RNG stream, MIS weights, env lookup — shows up here immediately. Goldens were
generated on the CPU backend (tests/conftest.py pins it) at 24px/8spp, seed 0.

Regenerate deliberately (after an intended estimator change) with:
    python -c "..."  # see tests/golden/README
"""

import os

import numpy as np
import pytest

from tpupt.render.renderer import render_image
from tpupt.scenes import SCENES

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize(
    "sid",
    [pytest.param(s, marks=pytest.mark.slow) if s == 5 else s for s in sorted(SCENES)],
)
def test_golden_scene(sid):
    name, build = SCENES[sid]
    path = os.path.join(GOLDEN, f"scene{sid}_{name}_24px_8spp.npy")
    golden = np.load(path)
    scene, cam = build(24, 8)
    compiled = scene.compile()
    _, mean, _ = render_image(compiled, cam, seed=0, rays_per_launch=1 << 14, progress=False)
    # same backend + same seed -> only compiler reassociation noise is tolerated
    np.testing.assert_allclose(mean, golden, rtol=1e-4, atol=1e-5)

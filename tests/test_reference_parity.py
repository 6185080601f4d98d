"""Statistical parity against the reference's committed demo PNGs (demo/*.png —
the only ground-truth outputs the reference publishes, SURVEY.md section 4).

The reference renders are 1920x1080 @ 4000 spp with an UNSEEDED thread_rng
(camera.rs:134 etc.), so pixel-exact comparison is impossible by construction;
what must agree is the converged estimate. We render at low res / moderate spp and
compare gamma-space block means.

Measured round 1 (128px, 24 spp, CPU):
    scene 2 earth   global mean 0.5695 vs 0.5695   block max|diff| 0.044
    scene 4 lights  global mean 0.3781 vs 0.3767   block max|diff| 0.019
    scene 5 bsdf    global mean 0.5568 vs 0.5495   block max|diff| 0.046
    scene 1 balls   global mean 0.5774 vs 0.5805   (sphere layout is random in the
                    reference -> only global stats comparable)
    scene 6 scene6  global mean 0.3815 vs 0.3824   (glass caustics -> high block
                    variance at low spp; global stats comparable)

Opt-in (renders 5 scenes on CPU, ~5 min): TPUPT_SLOW=1 python -m pytest tests/test_reference_parity.py
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("TPUPT_SLOW"), reason="slow reference-parity render; set TPUPT_SLOW=1"
)

DEMO_DIR = "/root/reference/demo"
# sid -> (demo name, block tolerance or None for global-stats-only)
CASES = {
    1: ("balls", None),  # reference sphere layout is unseeded-random
    2: ("earth", 0.06),
    4: ("lights", 0.04),
    5: ("bsdf", 0.07),
    6: ("scene6", None),  # caustic variance dominates blocks at low spp
}


def _blocks(a, by=9, bx=16):
    h, w = a.shape[:2]
    return a[: h // by * by, : w // bx * bx].reshape(by, h // by, bx, w // bx, 3).mean(axis=(1, 3))


@pytest.mark.parametrize("sid", sorted(CASES))
def test_reference_demo_parity(sid):
    from PIL import Image

    from tpupt.render.renderer import render_image
    from tpupt.scenes import SCENES

    demo, block_tol = CASES[sid]
    ref = np.asarray(Image.open(os.path.join(DEMO_DIR, f"{demo}.png"))).astype(np.float32) / 255.0
    name, build = SCENES[sid]
    scene, cam = build(128, 24)
    img, _, _ = render_image(scene.compile(), cam, rays_per_launch=1 << 15, progress=False)
    ours = np.asarray(img).astype(np.float32) / 255.0

    np.testing.assert_allclose(ours.mean(), ref.mean(), atol=0.015)
    if block_tol is not None:
        np.testing.assert_allclose(_blocks(ours), _blocks(ref), atol=block_tol)

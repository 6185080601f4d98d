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
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute lane (pytest.ini)

_SLOW = pytest.mark.skipif(
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


@_SLOW
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


# ---------------------------------------------------------------------------
# round-2 additions (VERDICT item 6): parity evidence in the default loop, and
# coverage for scenes 3 & 7 (the reference repo's cornell.png / normals.png are
# stripped blobs, so their ground truth is a cross-backend check instead).
# ---------------------------------------------------------------------------

# global-mean parity for the cheap externally-groundtruthed scenes runs in the
# DEFAULT suite (64 px, 8 spp, seconds each on CPU); the 128 px block-level
# comparison above stays behind TPUPT_SLOW.
QUICK = {2: "earth", 4: "lights", 5: "bsdf"}


@pytest.mark.parametrize("sid", sorted(QUICK))
def test_reference_global_mean_quick(sid):
    from PIL import Image

    from tpupt.render.renderer import render_image
    from tpupt.scenes import SCENES

    ref = np.asarray(
        Image.open(os.path.join(DEMO_DIR, f"{QUICK[sid]}.png"))
    ).astype(np.float32) / 255.0
    name, build = SCENES[sid]
    scene, cam = build(64, 8)
    img, _, _ = render_image(scene.compile(), cam, rays_per_launch=1 << 14, progress=False)
    ours = np.asarray(img).astype(np.float32) / 255.0
    np.testing.assert_allclose(ours.mean(), ref.mean(), atol=0.02)


_TPU_RENDER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", r"%(repo)s/.jax_cache")
assert jax.default_backend() == "tpu", jax.default_backend()
jax.devices()  # raises if no backend is reachable
print("TPU_PRESENT", flush=True)  # sentinel: failures past this point are REAL
from tpupt.render.renderer import render_image
from tpupt.scenes import SCENES
sid = int(sys.argv[1])
name, build = SCENES[sid]
scene, cam = build(64, 8)
_, mean, _ = render_image(scene.compile(), cam, rays_per_launch=1 << 16, progress=False)
np.save(sys.argv[2], np.asarray(mean, np.float32))
print("TPU_OK")
"""


@pytest.mark.parametrize("sid", [3, 6, 7])
def test_tpu_cpu_cross_backend_parity(sid, tmp_path):
    """Scenes 3 (cornell), 6 (OBJ meshes) & 7 (normals): cross-backend — the TPU
    render (Pallas kernels, f32 hardware) must statistically match the CPU render
    of the same seeded estimator. Catches TPU-kernel-specific bugs the CPU suite
    cannot. Scene 6 is the round-2 VERDICT item 5 gap: it is the only scene that
    drives the SAH cluster packet kernel (ops/pallas_tri.py) on real Mosaic —
    scenes 3/7 have no triangles, and the kernel's in-suite parity tests
    otherwise run in interpret mode only (tests/test_pallas_tri.py)."""
    if os.environ.get("TPUPT_NO_TPU"):
        pytest.skip("TPU disabled via TPUPT_NO_TPU")
    repo = os.path.dirname(os.path.dirname(__file__))
    out = str(tmp_path / f"tpu_{sid}.npy")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _TPU_RENDER % dict(repo=repo), str(sid), out],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1500,
    )
    # Skip ONLY when the TPU backend never came up (the TPU_PRESENT sentinel
    # never printed). A failure AFTER the sentinel — e.g. a Mosaic kernel
    # `ABORTED: TPU backend error` — is a real kernel fault and MUST fail the
    # suite. (Round-3 postmortem: the old check skipped on any "tpu"/"backend"
    # substring in stderr and masked a genuinely broken kernel as "no TPU",
    # which is how a faulting rewrite shipped with a 123-green suite.)
    if r.returncode != 0 and "TPU_PRESENT" not in r.stdout:
        pytest.skip(f"no TPU attached: {r.stderr[-200:]}")
    assert r.returncode == 0, f"TPU render failed AFTER backend init:\n{r.stderr[-2000:]}"
    tpu = np.load(out)

    from tpupt.render.renderer import render_image
    from tpupt.scenes import SCENES

    name, build = SCENES[sid]
    scene, cam = build(64, 8)
    _, cpu, _ = render_image(scene.compile(), cam, rays_per_launch=1 << 16, progress=False)

    # same estimator, same RNG stream — but paths through glass are chaotic
    # (one f32 ulp of backend drift flips a refraction and the whole path), so
    # identical-path comparison only holds for the diffuse-dominated scene 3;
    # scene 7 (glass sphere + metal cuboid) is compared statistically.
    np.testing.assert_allclose(tpu.mean(), cpu.mean(), rtol=0.03)
    tb, cb = _blocks(np.asarray(tpu)), _blocks(np.asarray(cpu))
    c = np.corrcoef(tb.ravel(), cb.ravel())[0, 1]
    assert c > 0.985, c
    rel = np.abs(tb - cb) / np.maximum(np.abs(cb), 0.05)
    if sid == 3:
        assert np.max(rel) < 0.15, np.max(rel)
    else:
        # glass-caustic blocks (7: glass sphere; 6: glass bunny/teapot) are pure
        # Monte-Carlo noise at 8 spp; the robust center of the block
        # distribution is what must agree
        assert np.median(rel) < 0.12, np.median(rel)

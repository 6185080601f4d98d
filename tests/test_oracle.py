"""The f64 CPU oracle (core/dtypes.py TPUPT_ORACLE_X64) actually exercised.

SURVEY.md §7 decision 1: the reference computes in f64 (vec3.rs:3-6); this
framework's device path is f32, and the SAME integrator re-runs in f64 on CPU as
the calibration anchor. The counter RNG emits identical 24-bit uniforms in both
modes, so per-pixel differences are pure f32 round-off, not Monte-Carlo noise.

The f64 render runs in a subprocess (jax_enable_x64 must be set before arrays
exist); its film is compared against the in-process f32 render of the exact same
(scene, seed, spp) config. The measured drift calibrates the golden-image
tolerances (recorded in BASELINE.md).
"""

import json
import os
import subprocess
import sys

import numpy as np

_RENDER_SNIPPET = r"""
import os, sys, json
import numpy as np
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(r"%(repo)s", ".jax_cache"))
from tpupt.core.dtypes import ORACLE_X64, REAL
from tpupt.scenes import cornell_box_scene
from tpupt.render.renderer import render_image

import pytest

pytestmark = pytest.mark.slow  # multi-minute lane (pytest.ini)

scene, cam = cornell_box_scene(%(width)d, %(spp)d)
compiled = scene.compile()
_, mean, _ = render_image(compiled, cam, rays_per_launch=1 << 14, progress=False)
np.save(sys.argv[1], np.asarray(mean, dtype=np.float64))
print(json.dumps({"oracle": bool(ORACLE_X64), "dtype": str(REAL.dtype.name if hasattr(REAL, 'dtype') else REAL(0).dtype)}))
"""


def _render_subprocess(path, oracle: bool, width=24, spp=8):
    env = dict(os.environ)
    env["TPUPT_ORACLE_X64"] = "1" if oracle else "0"
    code = _RENDER_SNIPPET % dict(repo=os.path.dirname(os.path.dirname(__file__)), width=width, spp=spp)
    out = subprocess.run(
        [sys.executable, "-c", code, path],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert out.returncode == 0, f"subprocess failed:\n{out.stdout}\n{out.stderr}"
    meta = json.loads(out.stdout.strip().splitlines()[-1])
    assert meta["oracle"] == oracle
    return np.load(path)


def test_f64_oracle_drift(tmp_path):
    """Scene 3 low-spp: f32 vs f64 renders of the SAME paths. The drift bound
    asserted here is the calibrated golden tolerance (BASELINE.md)."""
    f32 = _render_subprocess(str(tmp_path / "f32.npy"), oracle=False)
    f64 = _render_subprocess(str(tmp_path / "f64.npy"), oracle=True)
    assert f32.shape == f64.shape
    # identical paths => differences are f32 round-off accumulated over bounces.
    drift = np.abs(f32 - f64)
    rel = drift / np.maximum(np.abs(f64), 1e-2)
    print(f"f32-vs-f64 drift: max abs {drift.max():.3e}, mean abs {drift.mean():.3e}, "
          f"max rel {rel.max():.3e}")
    # mean radiance in [0, ~30] (light source). Round-off after <=50 bounces of
    # f32 math stays orders below Monte-Carlo noise at real spp:
    assert drift.mean() < 2e-3
    assert np.median(rel) < 1e-3
    # same paths: images must correlate almost perfectly (a sampler divergence
    # between modes would decorrelate pixels, not just perturb them)
    c = np.corrcoef(f32.ravel(), f64.ravel())[0, 1]
    assert c > 0.99999, c

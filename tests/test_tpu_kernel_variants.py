"""Real-Mosaic contact for kernel-variant flags and the sharded cluster kernel
(VERDICT round-4 item 6).

The flag-matrix parity test (tests/test_pallas_tri.py) runs in interpret mode,
which proves NOTHING about Mosaic legality (round-3 postmortem: an
interpret-green kernel aborted real hardware). These tests run in a TPU
subprocess with the TPU_PRESENT sentinel pattern: skip only if the backend
never initialized; any fault after the sentinel fails the suite.

- test_flag_matrix_on_chip: every env-flag kernel variant compiled + executed
  on real Mosaic against the default configuration, hit-for-hit (one
  subprocess, small ray batch — each variant is a separate compile).
- test_render_image_mesh_on_chip: render_image(mesh=1-device Mesh) on a
  triangle scene — the shard_map + Mosaic cluster-kernel interplay, which no
  other test touches on hardware (the sharding suite runs on the virtual CPU
  mesh). Film must be bit-identical to the unsharded chip render.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute lane (pytest.ini)


def _run_tpu(script, *args, timeout=2400):
    repo = os.path.dirname(os.path.dirname(__file__))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", script % dict(repo=repo), *args],
        env=env, cwd=repo, capture_output=True, text=True, timeout=timeout,
    )
    if r.returncode != 0 and "TPU_PRESENT" not in r.stdout:
        pytest.skip(f"no TPU attached: {r.stderr[-200:]}")
    assert r.returncode == 0, f"TPU run failed AFTER backend init:\n{r.stderr[-2000:]}"
    return r.stdout


_FLAG_MATRIX = r"""
import os
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", r"%(repo)s/.jax_cache")
assert jax.default_backend() == "tpu", jax.default_backend()
jax.devices()
print("TPU_PRESENT", flush=True)

from tpupt.io.obj import load_obj
from tpupt.scene.builder import Diffuse, Scene
from tpupt.ops.pallas_tri import pallas_closest_tri

s = Scene()
s.add_mesh(load_obj("/root/reference/assets/bunny.obj"), Diffuse((0.7, 0.7, 0.7)), scale=20.0)
s.environment = (1.0, 1.0, 1.0)
sd = s.compile().data

rng = np.random.default_rng(11)
b = 8192
o = rng.normal(size=(b, 3)).astype(np.float32)
o = 3.0 * o / np.linalg.norm(o, axis=1, keepdims=True) + np.float32(1.0)
d = rng.normal(size=(b, 3)).astype(np.float32)
d = d / np.linalg.norm(d, axis=1, keepdims=True)
o, d = jnp.asarray(o), jnp.asarray(d)
t_in = jnp.full((b,), 3e38, jnp.float32)

def run(tag, env, hbm=False, **kw):
    for k, v in env.items():
        os.environ[k] = v
    try:
        t, i, aux = jax.jit(
            lambda: pallas_closest_tri(sd, o, d, t_in, 1e-3, hbm=hbm, **kw)
        )()
        out = [np.asarray(t), np.asarray(i)] + [np.asarray(aux[k]) for k in sorted(aux)]
        print("DONE", tag, flush=True)
        return out
    finally:
        for k in env:
            os.environ.pop(k, None)

default = run("default", {})
variants = {
    "unsorted": ({}, dict(sort=False, recull=False)),
    "recull": ({}, dict(sort=True, recull=True)),
    "gate": ({"TPUPT_TRI_GATE": "1"}, dict(sort=True, recull=False)),
    "nopair": ({"TPUPT_TRI_PAIR": "0"}, dict(sort=True, recull=False)),
    "nocqx": ({"TPUPT_TRI_CQX": "0"}, dict(sort=True, recull=False)),
    "hbm": ({}, dict(hbm=True)),
    "hbm4slot": ({"TPUPT_HBM_SLOTS": "4"}, dict(hbm=True)),
    "cqxhbm": ({"TPUPT_CQX_HBM": "1"}, dict(hbm=True)),
    "wordgate": ({"TPUPT_TRI_WORDGATE": "1"}, dict(hbm=True)),
}
for tag, (env, kw) in variants.items():
    kw = dict(kw)
    hbm = kw.pop("hbm", False)
    got = run(tag, env, hbm=hbm, **kw)
    for a, b_ in zip(default, got):
        np.testing.assert_array_equal(a, b_, err_msg=tag)
    print("MATCH", tag, flush=True)
print("TPU_OK")
"""


def test_flag_matrix_on_chip():
    out = _run_tpu(_FLAG_MATRIX)
    assert "TPU_OK" in out
    for tag in ("unsorted", "recull", "gate", "nopair", "nocqx", "hbm", "hbm4slot", "cqxhbm", "wordgate"):
        assert f"MATCH {tag}" in out, out[-2000:]


_MESH_RENDER = r"""
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", r"%(repo)s/.jax_cache")
assert jax.default_backend() == "tpu", jax.default_backend()
jax.devices()
print("TPU_PRESENT", flush=True)

from jax.sharding import Mesh
from tpupt.render.renderer import render_image
from tpupt.scenes import everything_scene

scene, cam = everything_scene(32, 4)
cam.max_depth = 6
compiled = scene.compile()
_, mean1, st1 = render_image(compiled, cam, progress=False)
mesh = Mesh(np.array(jax.devices()[:1]), ("samples",))
_, mean2, st2 = render_image(compiled, cam, progress=False, mesh=mesh)
assert st1.rays == st2.rays, (st1.rays, st2.rays)
np.testing.assert_array_equal(np.asarray(mean1), np.asarray(mean2))
print("TPU_OK")
"""


def test_render_image_mesh_on_chip():
    out = _run_tpu(_MESH_RENDER)
    assert "TPU_OK" in out

"""Native C++ runtime (tpupt/native): builds with the system toolchain and matches
the pure-Python fallbacks exactly (the Python paths are the parity oracles)."""

import numpy as np
import pytest

from tpupt import native
from tpupt.io.obj import load_obj
from tpupt.ops.bvh import build_tri_bvh

BUNNY = "/root/reference/assets/bunny.obj"
SPOT = "/root/reference/assets/spot.obj"


pytestmark = [pytest.mark.slow] + [pytest.mark.skipif(
    not native.available(), reason=f"native build unavailable: {native.load_error()}"
)]


@pytest.mark.parametrize("path", [BUNNY, SPOT])
def test_native_obj_matches_python(path):
    py = load_obj(path, native=False)
    nat = load_obj(path, native=True)
    np.testing.assert_array_equal(nat["indices"], py["indices"])
    np.testing.assert_array_equal(nat["positions"], py["positions"])
    for key in ("normals", "uvs"):
        if py[key] is None:
            assert nat[key] is None
        else:
            np.testing.assert_array_equal(nat[key], py[key])


def test_native_bvh_matches_python():
    rng = np.random.default_rng(0)
    n = 1777
    v0 = rng.normal(size=(n, 3)).astype(np.float32)
    e1 = (rng.normal(size=(n, 3)) * 0.1).astype(np.float32)
    e2 = (rng.normal(size=(n, 3)) * 0.1).astype(np.float32)
    order_py, nodes_py = build_tri_bvh(v0, e1, e2, native=False)
    order_nat, nodes_nat = build_tri_bvh(v0, e1, e2, native=True)
    np.testing.assert_array_equal(order_nat, order_py)
    for k in ("skip", "start", "count"):
        np.testing.assert_array_equal(nodes_nat[k], nodes_py[k])
    for k in ("bmin", "bmax"):
        np.testing.assert_allclose(nodes_nat[k], nodes_py[k], rtol=1e-6, atol=1e-6)

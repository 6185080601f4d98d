"""Pod-mesh (host x chip) SPMD: the 8-device CPU backend reshaped to (2, 4) —
the standard pod-free validation of DCN x ICI collective layouts."""

import jax
import numpy as np

from tpupt.parallel.multihost import make_pod_mesh, render_block_pod
from tpupt.parallel.sharding import make_mesh, render_block_sharded
from tpupt.scenes import cornell_box_scene


def test_pod_mesh_matches_flat_mesh():
    """A (2,4) pod mesh must produce the identical film to the flat 8-device
    mesh (same flattened sample shards, hierarchical vs flat psum)."""
    scene, cam = cornell_box_scene(8, 8)
    cam.max_depth = 6
    compiled = scene.compile()
    ids = np.arange(32, dtype=np.int32)
    rows, cols = ids // 8, ids % 8

    pod = make_pod_mesh(n_hosts=2, chips_per_host=4)
    film_pod, rays_pod = render_block_pod(compiled, cam, ids, rows, cols, spp=16, mesh=pod)
    film_flat, rays_flat = render_block_sharded(
        compiled, cam, ids, rows, cols, spp=16, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(
        np.asarray(film_pod), np.asarray(film_flat), rtol=1e-5, atol=1e-6
    )
    assert float(rays_pod) == float(rays_flat)


def test_pod_mesh_too_few_devices():
    import pytest

    with pytest.raises(RuntimeError, match="needs 16 devices"):
        make_pod_mesh(n_hosts=4, chips_per_host=4)

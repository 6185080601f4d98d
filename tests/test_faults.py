"""Launch-level elastic recovery (SURVEY.md section 5; VERDICT round-2 item 9).

The reference has no failure handling at all (unwrap() panics, texture.rs:63-67).
This framework's launches are pure functions of (scene, camera, ids, sample0,
seed), so a transient launch failure — device preemption, interconnect hiccup —
is recoverable by re-running the launch: the retry traces the exact same paths
and the resulting film is bit-identical to a run that never failed. The
`_fault_hook` module hook injects such failures deterministically.
"""

import numpy as np
import pytest

import tpupt.render.renderer as R
from tpupt.scenes import cornell_box_scene


def _render(**kw):
    scene, cam = cornell_box_scene(16, 32)
    compiled = scene.compile()
    # k=4, r=4 -> 16 samples/launch over spp=32 -> 2 sample-chunk launches
    return R.render_image(
        compiled, cam, progress=False, samples_per_launch=4, **kw
    )


@pytest.fixture(autouse=True)
def _clear_hook():
    yield
    R._fault_hook = None


def test_transient_fault_retried_bit_identical():
    _, mean_clean, st_clean = _render()
    assert st_clean.launches >= 2  # the schedule actually has a retryable middle

    calls = {"n": 0, "faults": 0}

    def hook(it):
        calls["n"] += 1
        if it == 1 and calls["faults"] == 0:
            calls["faults"] += 1
            raise RuntimeError("injected transient launch failure")

    R._fault_hook = hook
    _, mean_faulted, st = _render()
    assert calls["faults"] == 1
    assert calls["n"] == st.launches + 1  # exactly one extra attempt
    np.testing.assert_array_equal(mean_faulted, mean_clean)


def test_persistent_fault_raises():
    def hook(it):
        if it == 1:
            raise RuntimeError("injected persistent failure")

    R._fault_hook = hook
    with pytest.raises(RuntimeError, match="persistent"):
        _render()


def test_fault_then_checkpoint_resume(tmp_path):
    """A transient fault mid-render with checkpointing on: the retry succeeds,
    the checkpoint keeps advancing, and a subsequent resume is bit-identical."""
    ck = str(tmp_path / "film.npz")
    _, mean_clean, _ = _render()

    fired = {"done": False}

    def hook(it):
        if it == 1 and not fired["done"]:
            fired["done"] = True
            raise RuntimeError("injected transient failure")

    R._fault_hook = hook
    _, mean, _ = _render(checkpoint_path=ck)
    np.testing.assert_array_equal(mean, mean_clean)

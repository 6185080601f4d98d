"""Checkpoint/resume + progressive preview (SURVEY.md section 5: the reference is
single-shot, camera.rs:118; these are new aux subsystems). Resume must be exact —
the counter-based RNG makes the resumed render bit-identical."""

import os

import numpy as np
import pytest

from tpupt.render.camera import Camera
from tpupt.render.renderer import render_image
from tpupt.scene.builder import Diffuse, Light, Scene


def _scene():
    s = Scene()
    s.add_sphere(1.0, (0.0, 0.0, -3.0), Diffuse((0.6, 0.5, 0.4)))
    s.add_quad((-1.0, 2.5, -4.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), Light((6.0, 6.0, 6.0)), light=True)
    s.environment = (0.2, 0.3, 0.4)
    cam = Camera(
        aspect_ratio=1.0, image_width=10, samples_per_pixel=16, max_depth=6,
        vfov=30.0, look_from=(0, 0, 0), look_at=(0, 0, -1),
        blur_strength=0.5, focal_length=3.0, defocus_angle=0.0,
    )
    return s.compile(), cam


def test_checkpoint_resume_bit_identical(tmp_path):
    compiled, cam = _scene()
    # rays_per_launch == npix pins replication r=1 so the launch structure is 4 chunks
    kwargs = dict(rays_per_launch=100, samples_per_launch=4, progress=False)

    _, ref, _ = render_image(compiled, cam, **kwargs)

    ck = str(tmp_path / "film.npz")
    # simulate an interrupted render: run with a checkpoint, then chop the film
    # back to an earlier launch by re-writing the checkpoint mid-flight
    seen = []

    def interrupt(mean, frac):
        seen.append(frac)
        if len(seen) == 2:  # pretend the process dies after launch 2
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        render_image(compiled, cam, checkpoint_path=ck, on_launch=interrupt, **kwargs)
    assert os.path.exists(ck)
    assert int(np.load(ck)["next_it"]) == 2

    _, resumed, stats = render_image(compiled, cam, checkpoint_path=ck, **kwargs)
    np.testing.assert_array_equal(resumed, ref)


def test_checkpoint_config_mismatch(tmp_path):
    compiled, cam = _scene()
    ck = str(tmp_path / "film.npz")
    render_image(
        compiled, cam, checkpoint_path=ck, rays_per_launch=100,
        samples_per_launch=4, progress=False,
    )
    cam.samples_per_pixel = 32
    with pytest.raises(ValueError, match="different render config"):
        render_image(
            compiled, cam, checkpoint_path=ck, rays_per_launch=100,
            samples_per_launch=4, progress=False,
        )


def test_progressive_preview_converges():
    compiled, cam = _scene()
    previews = []
    _, final, _ = render_image(
        compiled, cam, rays_per_launch=100, samples_per_launch=4,
        progress=False, on_launch=lambda m, f: previews.append((m.copy(), f)),
    )
    assert len(previews) == 4  # 16 spp / 4 per launch
    assert previews[-1][1] == 1.0
    # the last preview IS the final mean; earlier ones are coarser estimates
    np.testing.assert_allclose(previews[-1][0], final, rtol=1e-6)
    assert np.isfinite(previews[0][0]).all()

def test_lane_replication_invariant():
    """r lanes per pixel (chip-filling replication) must not change the estimate:
    the same (pixel, sample) paths run, only scheduled across more lanes."""
    compiled, cam = _scene()
    _, a, sa = render_image(compiled, cam, rays_per_launch=100, progress=False)   # r = 1
    _, b, sb = render_image(compiled, cam, rays_per_launch=1600, progress=False)  # r = 16
    assert sa.paths == sb.paths
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)  # f32 sum reassociation only


def test_progress_print_path(capsys):
    """progress=True exercises the narration path (a refactor once broke it:
    every other test passes progress=False)."""
    compiled, cam = _scene()
    render_image(compiled, cam, rays_per_launch=100, samples_per_launch=8, progress=True)
    out = capsys.readouterr().out
    assert "pixel block 1/1 done" in out

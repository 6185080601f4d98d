"""Texture table evaluation (texture.rs) + camera ray generation (camera.rs:153-168)."""

import os

import jax.numpy as jnp
import numpy as np

import jax

from tpupt.ops.texture import eval_texture

_eval_texture = jax.jit(eval_texture)
from tpupt.scene.builder import CheckerTexture, Diffuse, ImageTexture, Scene, SolidTexture


def _sd_with_base_tex(tex):
    s = Scene()
    s.add_sphere(1.0, (0, 0, 0), Diffuse(tex))
    return s.compile().data


def _eval(sd, tid, u, v, p):
    return np.asarray(
        _eval_texture(
            sd,
            jnp.full((len(p),), tid, jnp.int32),
            jnp.asarray(u, jnp.float32),
            jnp.asarray(v, jnp.float32),
            jnp.asarray(p, jnp.float32),
        )
    )


def test_solid():
    sd = _sd_with_base_tex(SolidTexture((0.1, 0.2, 0.3)))
    out = _eval(sd, 0, [0.5], [0.5], [[0, 0, 0]])
    np.testing.assert_allclose(out, [[0.1, 0.2, 0.3]], atol=1e-6)


def test_checker_parity_including_negatives():
    """texture.rs:43-53: floor(p/scale) summed, parity picks tex1/tex2.

    Negative coordinates matter: Rust's % returns negative remainders but the
    `== 0` test agrees with jnp's mod for even/odd.
    """
    tex = CheckerTexture(1.0, SolidTexture((1.0, 0.0, 0.0)), SolidTexture((0.0, 1.0, 0.0)))
    sd = _sd_with_base_tex(tex)
    tid = 2  # checker interned after its two children
    pts = [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.5, 0.5, 0.5], [-1.5, 0.5, 0.5]]
    out = _eval(sd, tid, [0] * 4, [0] * 4, pts)
    # sums: 0+0+0=0 even; 1+0+0=1 odd; -1+0+0=-1 odd; -2+0+0=-2 even
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[3], [1, 0, 0], atol=1e-6)


def test_image_texture_lookup(tmp_path):
    """2x2 image: u clamped, v flipped, nearest-neighbor (texture.rs:73-91)."""
    from PIL import Image

    arr = np.zeros((2, 2, 3), np.uint8)
    arr[0, 0] = [255, 0, 0]  # top-left
    arr[0, 1] = [0, 255, 0]  # top-right
    arr[1, 0] = [0, 0, 255]  # bottom-left
    arr[1, 1] = [255, 255, 255]
    path = os.path.join(tmp_path, "t.png")
    Image.fromarray(arr).save(path)

    sd = _sd_with_base_tex(ImageTexture(path))
    # v=1 -> row 0 (flip); u=0 -> col 0
    out = _eval(sd, 0, [0.1, 0.9, 0.1, 0.9], [0.9, 0.9, 0.1, 0.1], [[0, 0, 0]] * 4)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-2)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-2)
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-2)
    np.testing.assert_allclose(out[3], [1, 1, 1], atol=1e-2)
    # u out of range clamps, u=1.0 edge doesn't overflow
    out = _eval(sd, 0, [1.0, 2.0, -1.0], [1.0, 1.0, 1.0], [[0, 0, 0]] * 3)
    np.testing.assert_allclose(out[0], [0, 1, 0], atol=1e-2)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-2)
    np.testing.assert_allclose(out[2], [1, 0, 0], atol=1e-2)


def test_camera_center_ray():
    """Zero blur + zero defocus: the center pixel ray goes straight to look_at."""
    from tpupt.render.camera import Camera, generate_rays

    cam = Camera(
        aspect_ratio=1.0,
        image_width=101,
        samples_per_pixel=1,
        vfov=40.0,
        look_from=(1.0, 2.0, 3.0),
        look_at=(1.0, 2.0, -7.0),
        blur_strength=0.0,
        focal_length=10.0,
        defocus_angle=0.0,
    )
    cd = cam.init()
    pix = jnp.asarray([50 * 101 + 50], jnp.int32)  # center pixel of 101x101
    o, d, t = generate_rays(
        cd, jnp.asarray([50]), jnp.asarray([50]), pix, jnp.asarray([0]), jnp.uint32(0)
    )
    np.testing.assert_allclose(np.asarray(o[0]), [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, -1.0], atol=1e-5)
    assert 0.0 <= float(t[0]) < 1.0


def test_camera_viewport_extent():
    """Corner pixel direction angle matches vfov/2 at the viewport edge."""
    from tpupt.render.camera import Camera, generate_rays

    cam = Camera(
        aspect_ratio=1.0,
        image_width=100,
        vfov=40.0,
        look_from=(0.0, 0.0, 0.0),
        look_at=(0.0, 0.0, -1.0),
        blur_strength=0.0,
        focal_length=1.0,
        defocus_angle=0.0,
    )
    cd = cam.init()
    # top edge center pixel: row 0, col 50 -> vertical angle ~ vfov/2 (minus half-pixel)
    o, d, t = generate_rays(
        cd, jnp.asarray([0]), jnp.asarray([50]), jnp.asarray([50], jnp.int32),
        jnp.asarray([0]), jnp.uint32(0),
    )
    dv = np.asarray(d[0])
    angle = np.degrees(np.arctan2(dv[1], -dv[2]))
    half_pixel = 20.0 / 100  # approx half-texel shift
    assert abs(angle - (20.0 - half_pixel)) < 0.3

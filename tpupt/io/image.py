"""Host-side image IO (replaces the reference's `image` crate usage).

The reference decodes every texture — including `.hdr` Radiance files — to Rgb8
(texture.rs:63-68: ``decode().to_rgb8()``), i.e. HDR environment maps are quantized to
LDR before lookup. We reproduce that quantization for parity (`hdr_scale=False` path);
keeping true f32 HDR is a documented upgrade toggled by the caller.
"""

from __future__ import annotations

import numpy as np


def _read_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) decoder -> float32 [H,W,3] linear."""
    import imageio.v3 as iio

    return np.asarray(iio.imread(path), dtype=np.float32)


def load_image_rgb8(path: str) -> np.ndarray:
    """Load any supported image as uint8 [H,W,3], matching Rgb8 quantization.

    Matches the `image` crate pipeline: decode -> to_rgb8 (texture.rs:63-68); the
    /255 happens at lookup time (texture.rs:84-90), exactly like the reference.
    For float sources (.hdr) the crate clamps to [0,1] and scales by 255.
    """
    if path.lower().endswith(".hdr"):
        data = _read_radiance_hdr(path)
        q = np.clip(data, 0.0, 1.0) * 255.0 + 0.5
        return np.floor(q).clip(0, 255).astype(np.uint8)
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def load_image_f32(path: str) -> np.ndarray:
    """Load at full precision (HDR stays HDR) — the documented upgrade path."""
    if path.lower().endswith(".hdr"):
        return _read_radiance_hdr(path)
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.float32) / 255.0


def save_png(path: str, rgb8: np.ndarray) -> None:
    """Write an [H,W,3] uint8 array as PNG (camera.rs:118-123)."""
    from PIL import Image

    Image.fromarray(rgb8, mode="RGB").save(path)

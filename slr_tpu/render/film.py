"""Film accumulation and development.

Reference: libSLR/Core/ImageSensor.{h,cpp}. The reference keeps per-texel
Kahan-compensated spectral strata sums and tone-maps at save time
(ImageSensor.cpp:140-186). Here the film is a plain (H, W, S) float32 array
(fp32 accumulation on TPU needs no compensation at our sample counts; a
compensated variant can be added for >1M spp), plus a pure `develop` that
reproduces save-time processing: scale x sensitivity, clamp, luminance
tone-map (1-e^-Y)/Y, sRGB gamma.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.math3d import Array
from ..spectrum.rgb import luminance, srgb_gamma


def develop(film_rgb: Array, scale: Array | float = 1.0) -> Array:
    """(H, W, 3) linear accumulated RGB -> (H, W, 3) display RGB in [0,1]."""
    rgb = jnp.maximum(film_rgb * scale, 0.0)
    y = luminance(rgb)
    scale_y = jnp.where(y != 0.0, (1.0 - jnp.exp(-y)) / jnp.maximum(y, 1e-20), 0.0)
    rgb = jnp.minimum(rgb * scale_y[..., None], 1.0)
    return jnp.minimum(srgb_gamma(rgb), 0.999)


def to_uint8(img01) -> np.ndarray:
    return (np.asarray(img01) * 256.0).clip(0, 255).astype(np.uint8)


def save_png(path: str, img01) -> None:
    """Minimal dependency-free PNG writer (RGB8)."""
    import struct
    import zlib

    arr = to_uint8(img01)
    h, w = arr.shape[:2]
    raw = b"".join(
        b"\x00" + arr[row].tobytes() for row in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    png += chunk(b"IDAT", zlib.compress(raw, 6))
    png += chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(png)

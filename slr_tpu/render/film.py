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


def save_bmp(path: str, img01) -> None:
    """Minimal BMP writer (24-bit BGR, bottom-up) — the reference's output
    format (libSLR/Helper/bmp_exporter.{h,cpp}, used by ImageSensor::saveImage
    and the distribution debug dumps)."""
    import struct

    arr = to_uint8(img01)
    h, w = arr.shape[:2]
    row_pad = (-3 * w) % 4
    body = b"".join(
        arr[h - 1 - row, :, ::-1].tobytes() + b"\x00" * row_pad
        for row in range(h)
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835,
                    0, 0)
    with open(path, "wb") as f:
        f.write(header + body)


class CompensatedFilm:
    """Kahan-compensated accumulation buffer (reference CompensatedSum /
    SpectrumStorage, CompensatedSum.h:1-35, SpectrumTypes.h:826-835).

    fp32 accumulation is adequate at typical sample counts; this variant
    keeps the compensation term for very long progressive runs (>~1M spp)
    where per-texel sums span many orders of magnitude. Pure pytree —
    checkpointable with utils/checkpoint.py."""

    def __init__(self, height: int, width: int, channels: int):
        import jax.numpy as jnp

        self.sum = jnp.zeros((height, width, channels), jnp.float32)
        self.comp = jnp.zeros((height, width, channels), jnp.float32)

    def add(self, values):
        """values: (H, W, C) one pass of contributions."""
        self.sum, self.comp = kahan_add(self.sum, self.comp, values)
        return self

    @property
    def value(self):
        return self.sum + self.comp


def kahan_add(total, comp, values):
    """One Kahan step (CompensatedSum::operator+=, CompensatedSum.h:18-27)."""
    y = values - comp
    t = total + y
    new_comp = (t - total) - y
    return t, new_comp

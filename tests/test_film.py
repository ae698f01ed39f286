"""Film / image-output tests: BMP writer, Kahan-compensated accumulation."""
import struct

import jax.numpy as jnp
import numpy as np

from slr_tpu.render.film import CompensatedFilm, kahan_add, save_bmp, to_uint8


def test_save_bmp_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(7, 5, 3).astype(np.float32)
    path = str(tmp_path / "out.bmp")
    save_bmp(path, img)
    data = open(path, "rb").read()
    assert data[:2] == b"BM"
    file_size = struct.unpack("<I", data[2:6])[0]
    assert file_size == len(data)
    w, h = struct.unpack("<ii", data[18:26])
    assert (w, h) == (5, 7)
    bpp = struct.unpack("<H", data[28:30])[0]
    assert bpp == 24
    # decode the pixel block (bottom-up BGR, rows padded to 4 bytes)
    row_bytes = (3 * w + 3) // 4 * 4
    px = np.frombuffer(data[54:], np.uint8).reshape(h, row_bytes)
    decoded = px[::-1, : 3 * w].reshape(h, w, 3)[:, :, ::-1]
    np.testing.assert_array_equal(decoded, to_uint8(img))


def test_kahan_add_beats_naive():
    # Large base + many tiny increments: fp32 naive accumulation loses them,
    # compensated accumulation keeps them (CompensatedSum.h semantics).
    total = jnp.float32(1.0e8)
    comp = jnp.float32(0.0)
    naive = jnp.float32(1.0e8)
    for _ in range(100):
        total, comp = kahan_add(total, comp, jnp.float32(0.5))
        naive = naive + jnp.float32(0.5)
    # fp32 ulp at 1e8 is 8, so the best representable answer is within 8.
    assert float(naive) == 1.0e8  # increments vanish entirely
    assert abs(float(total + comp) - (1.0e8 + 50.0)) <= 8.0


def test_compensated_film_accumulates():
    film = CompensatedFilm(2, 3, 3)
    for _ in range(10):
        film.add(jnp.ones((2, 3, 3), jnp.float32) * 0.1)
    np.testing.assert_allclose(np.asarray(film.value), 1.0, rtol=1e-6)

"""OpenEXR container round-trip tests (slr_tpu.utils.exr).

The reference loads EXR environments via Imf::RgbaInputFile
(libSLRSceneGraph/Helper/image_loader.cpp:9-12); these tests pin our
pure-numpy reader/writer: ZIP scanline round trip at half precision, RGB
vs RGBA, odd sizes (partial final 16-row block), and the scene-API hookup.
"""
import os

import numpy as np

from slr_tpu.utils.exr import read_exr, write_exr


def _rand_img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    # HDR-ish range incl. values > 1 and exact zeros
    img = rng.gamma(1.5, 1.0, (h, w, c)).astype(np.float32)
    img[0, 0] = 0.0
    img[-1, -1] = 123.5
    return img


def test_roundtrip_rgb_zip(tmp_path):
    img = _rand_img(33, 47, 3)  # odd size: partial last scanline block
    p = os.path.join(tmp_path, "t.exr")
    write_exr(p, img)
    out = read_exr(p)
    assert out.shape == (33, 47, 4)
    assert np.all(out[..., 3] == 1.0)
    # half precision: relative error <= 2^-11
    np.testing.assert_allclose(out[..., :3], img.astype(np.float16), rtol=1e-3)


def test_roundtrip_rgba(tmp_path):
    img = _rand_img(16, 16, 4, seed=3)
    p = os.path.join(tmp_path, "t.exr")
    write_exr(p, img)
    out = read_exr(p)
    np.testing.assert_allclose(out, img.astype(np.float16), rtol=1e-3)


def test_rejects_non_exr(tmp_path):
    p = os.path.join(tmp_path, "bogus.exr")
    with open(p, "wb") as f:
        f.write(b"not an exr at all")
    try:
        read_exr(p)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_scene_api_loads_exr_env(tmp_path):
    """setEnvironment with a real EXR next to the scene file reaches the
    flat scene as an env map with the EXR's pixels (not the placeholder)."""
    from slr_tpu.scene.api import read_scene

    img = np.zeros((8, 16, 3), np.float32)
    img[:, :, 0] = 7.25  # distinctive constant
    write_exr(os.path.join(tmp_path, "env.exr"), img)
    scene_txt = os.path.join(tmp_path, "s.txt")
    with open(scene_txt, "w") as f:
        f.write('setEnvironment("env.exr", 1.0);\n')
    desc, _ = read_scene(scene_txt)
    assert desc.env_image is not None
    env_img = np.asarray(desc.env_image)
    assert env_img.shape[0] == 8 and env_img.shape[1] == 16
    np.testing.assert_allclose(env_img[..., 0], 7.25, rtol=1e-3)

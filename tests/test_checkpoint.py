"""Checkpoint/resume tests (utils/checkpoint.py).

The film accumulator + sample counter are a pure pytree; with counter-based
RNG a resumed render must equal an uninterrupted one bit-for-bit.
"""
import numpy as np

from slr_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    path = str(tmp_path / "ck")
    accum = np.random.RandomState(0).rand(8, 6, 3).astype(np.float32)
    save_checkpoint(path, {"accum": accum, "done": 5})
    state = load_checkpoint(path)
    assert state is not None
    assert int(state["done"]) == 5
    np.testing.assert_array_equal(np.asarray(state["accum"]), accum)


def test_missing_returns_none(tmp_path):
    assert load_checkpoint(str(tmp_path / "nope")) is None


def test_resume_equals_uninterrupted():
    # Splitting an N-spp render at a checkpoint reproduces the uninterrupted
    # result because sample streams are keyed by absolute sample id
    # (sample_offset), not by pass.
    from slr_tpu.render.pt import render
    from slr_tpu.scene.presets import cornell_box_spheres

    scene = cornell_box_spheres(sphere_res=6, use_bvh=False)
    w, h = 16, 12
    full = np.asarray(render(scene, w, h, spp=4, seed=7, max_depth=2)) * 4
    a = np.asarray(render(scene, w, h, spp=2, seed=7, max_depth=2)) * 2
    b = np.asarray(
        render(scene, w, h, spp=2, seed=7, max_depth=2, sample_offset=2)
    ) * 2
    np.testing.assert_allclose(a + b, full, rtol=1e-5, atol=1e-6)

"""Persistent-wavefront (regeneration) renderer: equivalence with pt.render.

Because both renderers draw every random decision from the same
(pixel, sample, bounce, decision) counters, regeneration must reproduce
pt.render's images to fp tolerance — same estimator, different scheduling.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.render.pt import render
from slr_tpu.render.wavefront import render_wavefront
from slr_tpu.scene.presets import cornell_box_spheres

W, H = 32, 24


@pytest.fixture(scope="module")
def scene():
    return cornell_box_spheres(sphere_res=6, use_bvh=True)


def test_matches_pt_render(scene):
    ref = np.asarray(render(scene, W, H, spp=3, seed=7, max_depth=5))
    out, iters = render_wavefront(scene, W, H, spp=3, seed=7, max_depth=5,
                                  return_iters=True)
    out = np.asarray(out)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
    # regeneration can never exceed the padded schedule spp * (max_depth + 1);
    # at tiny max_depth it may reach it (one lane RR-extends every sample) —
    # the win shows at the reference's depth cap (test_deep_paths_affordable).
    assert iters <= 3 * 6


def test_sample_offset_resume(scene):
    """Half + half == whole (counter-based RNG, absolute sample ids)."""
    whole = np.asarray(render_wavefront(scene, W, H, spp=4, seed=5, max_depth=4))
    a = np.asarray(render_wavefront(scene, W, H, spp=2, seed=5, max_depth=4))
    b = np.asarray(render_wavefront(scene, W, H, spp=2, seed=5, max_depth=4,
                                    sample_offset=2))
    np.testing.assert_allclose((a + b) / 2, whole, rtol=1e-5, atol=1e-7)


def test_deep_paths_affordable(scene):
    """max_depth=100 (the reference's cap) costs ~max-over-lanes total path
    length, not spp * 101: the padded schedule would need 404 iterations for
    4 spp. (A single TIR lane inside the glass sphere can legitimately reach
    the 100-bounce cap, so the bound is per-wavefront, not per-path.)"""
    out, iters = render_wavefront(scene, W, H, spp=4, seed=1, max_depth=100,
                                  return_iters=True)
    assert np.isfinite(np.asarray(out)).all()
    assert iters < 4 * 101 * 0.6  # regeneration must beat the padded schedule

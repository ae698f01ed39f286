"""Multi-device completeness (SURVEY §2.4): spectral PT and BPT under
shard_map agree with their single-device renders (counter-based RNG makes
the comparison near-bitwise; psum/strata reduction order allows float eps).
Runs on the 8-virtual-device CPU mesh from conftest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.parallel.mesh import make_mesh, render_bpt_sharded, render_sharded
from slr_tpu.render.bpt import render_bpt
from slr_tpu.render.pt import render
from slr_tpu.scene.presets import cornell_box_spheres

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_spectral_pt_shard_invariance():
    scene = cornell_box_spheres(sphere_res=6, spectral=True)
    w, h = 16, 16
    mesh = make_mesh(8)
    img = np.asarray(
        render_sharded(scene, w, h, spp=1, mesh=mesh, max_depth=3)
    )
    from slr_tpu.spectrum.spectral import NUM_STRATA

    assert img.shape == (h, w, NUM_STRATA)
    # Single-device reference from the unsharded renderer (render() develops
    # strata to RGB, so compare via the sharded path on a 1-device mesh).
    ref = np.asarray(
        render_sharded(scene, w, h, spp=1, mesh=make_mesh(1), max_depth=3)
    )
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)
    assert np.isfinite(img).all() and img.mean() > 0


def test_bpt_shard_invariance():
    scene = cornell_box_spheres(sphere_res=6, metal=False, glass=False)
    w, h = 16, 12
    mesh = make_mesh(8)
    img = np.asarray(
        render_bpt_sharded(scene, w, h, spp=1, mesh=mesh,
                           max_light_verts=3, max_eye_verts=3)
    )
    ref = np.asarray(
        render_bpt(scene, w, h, spp=1, max_light_verts=3, max_eye_verts=3)
    )
    np.testing.assert_allclose(img, ref, rtol=1e-4, atol=1e-6)
    assert img.mean() > 0

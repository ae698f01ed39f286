"""Progressive photon mapping (AMCMCPPM analogue) tests.

The reference's AMCMCPPMRenderer is dormant (README.md:50-51) so there is no
behavioral oracle; these tests assert estimator consistency instead: the SPPM
estimate on the Cornell preset must converge toward the PT estimate of the
same scene (two independent estimators of the same integral, the reference's
own PT-vs-BPT cross-check promoted to PT-vs-PPM).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.render.ppm import init_state, ppm_iteration, develop_ppm, render_ppm
from slr_tpu.render.pt import render
from slr_tpu.scene.presets import cornell_box_spheres

W, H = 32, 24


@pytest.fixture(scope="module")
def scene():
    return cornell_box_spheres(sphere_res=6, use_bvh=True)


def test_ppm_iteration_shapes(scene):
    state = init_state(scene, W, H, r0=0.1, n_chains=256, max_bounces=3)
    state = ppm_iteration(scene, state, W, H, jnp.uint32(0), jnp.uint32(5),
                          n_photon_paths=256, max_bounces=3, grid_res=16,
                          k_per_cell=4, use_mcmc=False)
    assert state.tau.shape == (W * H, 3)
    assert float(state.n_emitted) == 256  # photon PATHS emitted this wave
    img = develop_ppm(state, W, H, 1)
    assert img.shape == (H, W, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_ppm_radius_shrinks(scene):
    state0 = init_state(scene, W, H, r0=0.2, n_chains=128, max_bounces=3)
    state = state0
    for i in range(3):
        state = ppm_iteration(scene, state, W, H, jnp.uint32(i), jnp.uint32(1),
                              n_photon_paths=512, max_bounces=3, grid_res=16,
                              k_per_cell=4, use_mcmc=False)
    r2_0 = np.asarray(state0.r2)
    r2 = np.asarray(state.r2)
    n = np.asarray(state.n)
    # every pixel that received photons must have shrunk its radius
    assert (r2[n > 0] < r2_0[n > 0]).all()
    assert (r2 <= r2_0 + 1e-7).all()


def test_ppm_converges_to_pt(scene):
    """Mean image brightness of SPPM ~ PT (loose: both estimate the same
    radiance; SPPM at small iteration counts carries kernel bias)."""
    pt_img = np.asarray(render(scene, W, H, spp=32, max_depth=5, seed=3))
    ppm_img = np.asarray(render_ppm(
        scene, W, H, n_iterations=8, n_photon_paths=8192, max_bounces=5,
        seed=3, k_per_cell=32, r0=0.08))
    pt_mean = pt_img.mean()
    ppm_mean = ppm_img.mean()
    assert ppm_mean == pytest.approx(pt_mean, rel=0.45)
    # structural agreement: bright regions line up (correlation over pixels)
    a = pt_img.mean(-1).ravel()
    b = ppm_img.mean(-1).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.7


def test_amcmc_chain_bookkeeping(scene):
    state = init_state(scene, W, H, r0=0.15, n_chains=256, max_bounces=3)
    state = ppm_iteration(scene, state, W, H, jnp.uint32(0), jnp.uint32(9),
                          n_photon_paths=256, max_bounces=3, grid_res=16,
                          k_per_cell=4, use_mcmc=True)
    assert float(state.n_uniform) == 256
    assert 0.0 <= float(state.n_visible) <= 256
    assert 1e-4 <= float(state.mutation_size) <= 1.0
    # chains seeded from visible uniform candidates
    assert bool(jnp.any(state.chain_alive)) or float(state.n_visible) == 0

"""InverseBSDF (FLIPPED_LAMBERT): the createSurfaceMaterial("inverse", ...)
material flips the scattering hemisphere (reference basic_BSDFs.cpp:173-207).
Covers the reference scenes' two-sided sum(matte, inverse(matte)) idiom
(TestScenes/RTC3.txt:14-18)."""
import jax.numpy as jnp
import numpy as np

from slr_tpu.bsdf.bsdf import (
    bsdf_evaluate,
    bsdf_pdf,
    bsdf_sample,
    gather_lobes,
)
from slr_tpu.scene.build import SceneBuilder


def _one_tri(b, mat):
    b.add_mesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.tile(np.float32([0, 0, 1]), (3, 1)),
        tangents=np.tile(np.float32([1, 0, 0]), (3, 1)),
        uvs=np.zeros((3, 2), np.float32),
        tri_vidx=np.array([[0, 1, 2]], np.int32),
        mat_id=mat,
    )


def _scene_with(builder_fn):
    b = SceneBuilder()
    refl = b.add_stex_const((0.6, 0.6, 0.6))
    mat = builder_fn(b, refl)
    _one_tri(b, mat)
    em = b.add_stex_const((1.0, 1.0, 1.0))
    _one_tri(b, b.add_emitter(b.add_matte(refl), em))
    b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
    return b.build(use_bvh=False), mat


def test_flipped_lambert_hemisphere():
    scene, mat = _scene_with(lambda b, r: b.add_inverse(b.add_matte(r)))
    r = 64
    mat_id = jnp.full((r,), mat, jnp.int32)
    uv = jnp.zeros((r, 2))
    lobes = gather_lobes(scene, mat_id, uv, jnp.zeros((r, 3)))
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (r, 1))
    gn = wo
    hero = jnp.zeros((r,), jnp.int32)
    wl = jnp.zeros((r,), bool)
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.rand(3, r).astype(np.float32))
    smp = bsdf_sample(lobes, wo, gn, hero, wl, u[0], u[1], u[2])
    # Every sampled direction lies in the hemisphere opposite wo.
    assert bool(jnp.all(smp.wi[:, 2] < 0.0))
    assert bool(jnp.all(smp.pdf > 0.0))
    np.testing.assert_allclose(
        np.asarray(smp.fs[:, 0]), 0.6 / np.pi, rtol=1e-5)

    # eval/pdf: nonzero only on the flipped side.
    wi_down = jnp.tile(jnp.asarray([[0.0, 0.6, -0.8]]), (r, 1))
    wi_up = jnp.tile(jnp.asarray([[0.0, 0.6, 0.8]]), (r, 1))
    assert float(bsdf_evaluate(lobes, wo, wi_down, gn, hero)[0, 0]) > 0
    assert float(bsdf_evaluate(lobes, wo, wi_up, gn, hero)[0, 0]) == 0
    assert float(bsdf_pdf(lobes, wo, wi_down, gn, hero)[0]) > 0
    assert float(bsdf_pdf(lobes, wo, wi_up, gn, hero)[0]) == 0


def test_two_sided_sum_idiom():
    """sum(matte, inverse(matte)) scatters into BOTH hemispheres with the
    correct density (each side a 0.3-albedo lambert)."""
    def mk(b, r):
        r3 = b.add_stex_const((0.3, 0.3, 0.3))
        return b.add_summed(b.add_matte(r3), b.add_inverse(b.add_matte(r3)))

    scene, mat = _scene_with(mk)
    r = 4096
    mat_id = jnp.full((r,), mat, jnp.int32)
    lobes = gather_lobes(scene, mat_id, jnp.zeros((r, 2)), jnp.zeros((r, 3)))
    wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (r, 1))
    gn = wo
    hero = jnp.zeros((r,), jnp.int32)
    wl = jnp.zeros((r,), bool)
    rs = np.random.RandomState(1)
    u = jnp.asarray(rs.rand(3, r).astype(np.float32))
    smp = bsdf_sample(lobes, wo, gn, hero, wl, u[0], u[1], u[2])
    frac_down = float(jnp.mean((smp.wi[:, 2] < 0).astype(jnp.float32)))
    assert 0.4 < frac_down < 0.6
    # Energy balance: E[fs * cos / pdf] = total two-sided albedo (0.3 + 0.3).
    w = smp.fs[:, 0] * jnp.abs(smp.wi[:, 2]) / jnp.maximum(smp.pdf, 1e-30)
    assert abs(float(jnp.mean(w)) - 0.6) < 0.02

"""Worklist-driven Pallas intersector: interpret-mode parity vs brute force.

The kernel proper runs on TPU; here pallas_call(interpret=True) executes the
same program (scalar prefetch, manual DMA, dynamic-trip-count traversal) on
the CPU and its hits/occlusions must match the reference-style brute-force
scan (accel/intersect.py) exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.accel.intersect import intersect_brute
from slr_tpu.accel.lbvh import build_bvh
from slr_tpu.accel.pallas_intersect import (
    anyhit_pallas,
    build_pallas_tris,
    intersect_pallas,
)
from slr_tpu.scene.presets import cornell_box_spheres


@pytest.fixture(scope="module")
def scene():
    return cornell_box_spheres()


@pytest.fixture(scope="module")
def tables(scene):
    geom = scene.geometry
    bvh = build_bvh(np.asarray(geom.positions), np.asarray(geom.tri_vidx))
    return build_pallas_tris(geom, bvh=bvh)


def _rand_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_chunks_cover_all_tris(scene, tables):
    covered = np.unique(np.asarray(tables.remap))
    covered = covered[covered >= 0]
    assert len(covered) == scene.geometry.num_tris


def test_closest_hit_matches_brute(scene, tables):
    o, d = _rand_rays(517)
    hit_k = intersect_pallas(scene.geometry, tables, o, d, interpret=True)
    hit_b = intersect_brute(scene.geometry, o, d)
    assert bool(jnp.all(hit_k.mask == hit_b.mask))
    # Same triangle except where two triangles tie on t (shared edges).
    same = hit_k.tri == hit_b.tri
    close = jnp.abs(hit_k.t - hit_b.t) <= 1e-4 * jnp.maximum(hit_b.t, 1.0)
    assert float(jnp.mean(jnp.where(hit_b.mask, same | close, True))) > 0.995
    np.testing.assert_allclose(
        np.asarray(jnp.where(hit_b.mask, hit_k.t, 0.0)),
        np.asarray(jnp.where(hit_b.mask, hit_b.t, 0.0)),
        rtol=2e-4, atol=2e-5,
    )


def test_anyhit_matches_brute(scene, tables):
    o, d = _rand_rays(511, seed=3)
    tmax = jnp.full((511,), 0.7, jnp.float32)
    occ_k = anyhit_pallas(scene.geometry, tables, o, d, tmax=tmax,
                          interpret=True)
    hit_b = intersect_brute(scene.geometry, o, d, tmax=0.7)
    assert bool(jnp.all(occ_k == hit_b.mask))


def test_active_mask_opt_out(scene, tables):
    """Inactive lanes report no hit and don't disturb active lanes."""
    o, d = _rand_rays(384, seed=7)
    active = jnp.asarray(np.random.RandomState(9).rand(384) < 0.4)
    hit_m = intersect_pallas(scene.geometry, tables, o, d, active=active,
                             interpret=True)
    hit_f = intersect_pallas(scene.geometry, tables, o, d, interpret=True)
    assert not bool(jnp.any(hit_m.mask & ~active))
    sel = active & hit_f.mask
    assert bool(jnp.all(jnp.where(sel, hit_m.tri == hit_f.tri, True)))

    occ_m = anyhit_pallas(scene.geometry, tables, o, d, tmax=2.0,
                          active=active, interpret=True)
    occ_f = anyhit_pallas(scene.geometry, tables, o, d, tmax=2.0,
                          interpret=True)
    assert not bool(jnp.any(occ_m & ~active))
    assert bool(jnp.all(jnp.where(active, occ_m == occ_f, True)))


def test_morton_fallback_no_bvh(scene):
    """Without a BVH the Morton chunking path must agree too."""
    tables = build_pallas_tris(scene.geometry)
    o, d = _rand_rays(256, seed=11)
    hit_k = intersect_pallas(scene.geometry, tables, o, d, interpret=True)
    hit_b = intersect_brute(scene.geometry, o, d)
    assert bool(jnp.all(hit_k.mask == hit_b.mask))


def test_worklist_stats(scene, tables):
    from slr_tpu.accel.pallas_intersect import worklist_stats

    o, d = _rand_rays(512)
    s = worklist_stats(tables, o, d)
    assert s["n_blocks"] == 2 and s["n_chunks"] == tables.n_chunks
    assert 0 < s["mean_chunks_per_block"] <= s["n_chunks"]
    # inactive lanes opt out entirely
    s0 = worklist_stats(tables, o, d, active=jnp.zeros((512,), bool))
    assert s0["mean_chunks_per_block"] == 0.0

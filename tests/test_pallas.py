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


class TestInstancedKernel:
    """The instanced worklist kernel ((chunk, instance) entries + in-kernel
    per-lane TRS ray transform) vs the XLA two-level traversal oracle
    (accel/twolevel.py) and brute force — including motion blur.
    Reference semantics: TransformedSurfaceObject (SurfaceObject.cpp:
    307-336) + AnimatedTransform (Transform.h:89-143)."""

    @pytest.fixture(scope="class")
    def inst_scene(self):
        from slr_tpu.scene.build import SceneBuilder

        b = SceneBuilder()
        mat = b.add_matte(b.add_stex_const((0.5, 0.5, 0.5)))
        # static ground quad
        g = np.float32([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]])
        nrm = np.tile(np.float32([0, 1, 0]), (4, 1))
        tan = np.tile(np.float32([1, 0, 0]), (4, 1))
        uv = np.zeros((4, 2), np.float32)
        b.add_mesh(g, nrm, tan, uv,
                   np.array([[0, 1, 2], [0, 2, 3]], np.int32), mat)
        # BLAS: a small sphere (~60 tris)
        bid = b.begin_blas()
        from slr_tpu.scene.presets import uv_sphere

        p, n, t, u, tris = uv_sphere((0.0, 0.0, 0.0), 0.25, 6, 10)
        b.add_mesh(p, n, t, u, tris, mat)
        b.end_blas()
        # static instances on a grid + one ANIMATED instance
        for i in range(4):
            for j in range(4):
                m = np.eye(4, dtype=np.float32)
                m[0, 3] = -1.5 + i
                m[1, 3] = 0.3
                m[2, 3] = -1.5 + j
                b.add_instance(bid, m)
        m0 = np.eye(4, dtype=np.float32)
        m0[1, 3] = 1.5
        m1 = m0.copy()
        m1[0, 3] = 1.0  # moves +x over the shutter
        b.add_instance(bid, m0, m1)
        b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
        return b.build(use_bvh=False)

    def _oracle(self, scene, o, d, f):
        from slr_tpu.accel.intersect import intersect_brute
        from slr_tpu.accel.twolevel import intersect_instances

        geom = scene.geometry.replace(
            tri_vidx=scene.geometry.tri_vidx[: scene.n_static],
            tri_mat=scene.geometry.tri_mat[: scene.n_static],
            tri_alpha=scene.geometry.tri_alpha[: scene.n_static],
            tri_ntex=scene.geometry.tri_ntex[: scene.n_static],
        )
        hit = intersect_brute(geom, o, d)
        hit2 = intersect_instances(scene.geometry, scene.instances, o, d, f)
        closer = hit2.mask & (hit2.t < jnp.where(hit.mask, hit.t, jnp.inf))
        import jax.numpy as jnp2

        return jnp2.where(closer, hit2.t, hit.t), (
            jnp2.where(closer, hit2.tri, hit.tri)), hit.mask | hit2.mask, (
            jnp2.where(closer, hit2.inst, -1))

    def test_closest_matches_twolevel(self, inst_scene):
        o, d = _rand_rays(517, seed=4)
        o = o * jnp.float32(2.0) + jnp.float32([0.0, 1.0, 0.0])
        f = jnp.zeros((517,), jnp.float32)
        hit = intersect_pallas(
            inst_scene.geometry, inst_scene.pallas_tris, o, d, f=f,
            instances=inst_scene.instances, interpret=True)
        t_o, tri_o, mask_o, inst_o = self._oracle(inst_scene, o, d, f)
        np.testing.assert_array_equal(np.asarray(hit.mask),
                                      np.asarray(mask_o))
        m = np.asarray(mask_o)
        np.testing.assert_allclose(np.asarray(hit.t)[m],
                                   np.asarray(t_o)[m], rtol=2e-5, atol=2e-5)
        same = np.asarray(hit.tri)[m] == np.asarray(tri_o)[m]
        assert same.mean() > 0.995, same.mean()  # shared-edge ties
        np.testing.assert_array_equal(
            np.asarray(hit.inst)[m][same], np.asarray(inst_o)[m][same])

    def test_motion_blur_matches_twolevel(self, inst_scene):
        n = 384
        o, d = _rand_rays(n, seed=9)
        o = o * jnp.float32(2.0) + jnp.float32([0.3, 1.4, 0.0])
        f = jnp.asarray(np.random.RandomState(2).uniform(0, 1, n),
                        jnp.float32)
        hit = intersect_pallas(
            inst_scene.geometry, inst_scene.pallas_tris, o, d, f=f,
            instances=inst_scene.instances, interpret=True)
        t_o, tri_o, mask_o, inst_o = self._oracle(inst_scene, o, d, f)
        np.testing.assert_array_equal(np.asarray(hit.mask),
                                      np.asarray(mask_o))
        m = np.asarray(mask_o)
        np.testing.assert_allclose(np.asarray(hit.t)[m],
                                   np.asarray(t_o)[m], rtol=2e-5, atol=2e-5)

    def test_anyhit_matches(self, inst_scene):
        n = 384
        o, d = _rand_rays(n, seed=11)
        o = o * jnp.float32(2.0) + jnp.float32([0.0, 1.0, 0.0])
        f = jnp.asarray(np.random.RandomState(3).uniform(0, 1, n),
                        jnp.float32)
        occ = anyhit_pallas(
            inst_scene.geometry, inst_scene.pallas_tris, o, d, tmax=3.0,
            f=f, interpret=True)
        t_o, tri_o, mask_o, _ = self._oracle(inst_scene, o, d, f)
        occ_o = np.asarray(mask_o) & (np.asarray(t_o) <= 3.0 * (1 + 1e-6))
        agree = np.asarray(occ) == occ_o
        assert agree.mean() > 0.995, agree.mean()  # tmax boundary ties

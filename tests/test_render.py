"""End-to-end render tests: intersection oracle, AOV pass, furnace test,
Cornell smoke, shard-count determinism (SURVEY.md §4 items (a),(b),(d))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.scene.build import SceneBuilder
from slr_tpu.scene.presets import cornell_box_spheres, uv_sphere
from slr_tpu.render.debug import render_aovs
from slr_tpu.render.pt import render, trace_radiance
from slr_tpu.accel.intersect import intersect_brute
from slr_tpu.accel.lbvh import intersect_bvh


@pytest.fixture(scope="module")
def cornell():
    return cornell_box_spheres(sphere_res=8, use_bvh=False)


@pytest.fixture(scope="module")
def cornell_bvh():
    return cornell_box_spheres(sphere_res=8, use_bvh=True)


class TestIntersect:
    def test_bvh_matches_brute(self, cornell_bvh):
        scene = cornell_bvh
        rs = np.random.RandomState(0)
        o = jnp.asarray(rs.uniform(-1.2, 1.2, (500, 3)), jnp.float32) + jnp.array(
            [0.0, 1.2, 0.0]
        )
        d = jnp.asarray(rs.randn(500, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        hb = intersect_brute(scene.geometry, o, d)
        hv = intersect_bvh(scene.geometry, scene.bvh, o, d)
        np.testing.assert_array_equal(np.asarray(hb.mask), np.asarray(hv.mask))
        np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hv.tri))
        both = np.asarray(hb.mask)
        np.testing.assert_allclose(
            np.asarray(hb.t)[both], np.asarray(hv.t)[both], rtol=1e-5
        )

    def test_plucker_matches_brute(self, cornell_bvh):
        """MXU Plücker intersector vs the Möller-Trumbore oracle."""
        from slr_tpu.accel.plucker import intersect_plucker

        scene = cornell_bvh
        rs = np.random.RandomState(7)
        o = jnp.asarray(rs.uniform(-1.2, 1.2, (800, 3)), jnp.float32) + jnp.array(
            [0.0, 1.2, 0.0]
        )
        d = jnp.asarray(rs.randn(800, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        hb = intersect_brute(scene.geometry, o, d)
        hp = intersect_plucker(scene.geometry, scene.plucker, o, d)
        agree = np.asarray(hb.mask) == np.asarray(hp.mask)
        assert agree.mean() > 0.995  # edge-grazing rays may differ
        hits = np.asarray(hb.mask) & np.asarray(hp.mask)
        tri_same = np.asarray(hb.tri)[hits] == np.asarray(hp.tri)[hits]
        assert tri_same.mean() > 0.99
        both = np.where(hits)[0][tri_same]
        np.testing.assert_allclose(
            np.asarray(hb.t)[both], np.asarray(hp.t)[both], rtol=1e-4
        )

    def test_single_triangle(self):
        from slr_tpu.accel.intersect import moller_trumbore

        p0 = jnp.array([0.0, 0.0, 0.0])
        p1 = jnp.array([1.0, 0.0, 0.0])
        p2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([0.2, 0.2, 1.0])
        d = jnp.array([0.0, 0.0, -1.0])
        t, b1, b2, hit = moller_trumbore(o, d, p0, p1, p2, 0.0, jnp.inf)
        assert bool(hit)
        np.testing.assert_allclose(float(t), 1.0, rtol=1e-6)
        np.testing.assert_allclose([float(b1), float(b2)], [0.2, 0.2], rtol=1e-5)


class TestAOV:
    def test_closed_box_fully_hit(self, cornell):
        aov = render_aovs(cornell, 32, 24)
        assert float(aov.hit.mean()) == 1.0
        # normals are unit where hit
        n = np.asarray(aov.s_normal).reshape(-1, 3)
        norms = np.linalg.norm(n, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # back wall distance ~ camera z (6.7) + 2.55
        d = np.asarray(aov.distance)
        assert d.max() < 10.0 and d.min() > 3.0


class TestFurnace:
    def test_white_furnace_equilibrium(self):
        """Uniformly emitting Lambert enclosure: L = Le / (1 - rho).

        This exercises the full loop: NEE + MIS + BSDF sampling + RR
        (reference cross-check promoted to automation, SURVEY.md §4)."""
        rho = 0.5
        m_emit = np.pi  # => Le = M/pi = 1
        b = SceneBuilder()
        refl = b.add_stex_const((rho, rho, rho))
        emit = b.add_stex_const((m_emit, m_emit, m_emit))
        matte = b.add_matte(refl)
        mat = b.add_emitter(matte, emit)
        pos, nrm, tan, uv, tris = uv_sphere((0, 0, 0), 2.0, 12, 24)
        # flip normals inward and triangle winding
        b.add_mesh(pos, -nrm, tan, uv, tris[:, ::-1], mat)
        b.set_camera_perspective(
            np.eye(4, dtype=np.float32), aspect=1.0, fovy=1.0,
            lens_radius=0.0, img_dist=1.0, obj_dist=1.0,
        )
        scene = b.build(use_bvh=False)

        n = 512
        rs = np.random.RandomState(3)
        d = rs.randn(n, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.zeros((n, 3), jnp.float32)
        c = trace_radiance(
            scene, o, jnp.asarray(d, jnp.float32),
            jnp.arange(n, dtype=jnp.uint32),
            jnp.zeros((n,), jnp.uint32), 0, max_depth=32,
        )
        est = float(jnp.mean(c))
        expected = 1.0 / (1.0 - rho)
        np.testing.assert_allclose(est, expected, rtol=0.05)


class TestCornell:
    def test_render_sane(self, cornell):
        img = render(cornell, 48, 36, spp=2, max_depth=6)
        a = np.asarray(img)
        assert a.shape == (36, 48, 3)
        assert np.isfinite(a).all()
        assert (a >= 0).all()
        assert a.mean() > 0.01  # lit scene
        # left third redder than right third (red vs blue walls)
        left = a[:, :16]
        right = a[:, -16:]
        assert left[..., 0].mean() > left[..., 2].mean()
        assert right[..., 2].mean() > right[..., 0].mean()

    def test_deterministic(self, cornell):
        i1 = np.asarray(render(cornell, 16, 12, spp=1, max_depth=4))
        i2 = np.asarray(render(cornell, 16, 12, spp=1, max_depth=4))
        np.testing.assert_array_equal(i1, i2)

    def test_ray_sorting_invariant(self, cornell):
        """Per-bounce wavefront re-sorting (coherence for the Pallas
        worklists) is a pure permutation: sorted and unsorted traces agree
        per lane to fp tolerance (the counter-based RNG draws identical
        randoms in any lane order)."""
        import jax.numpy as jnp

        from slr_tpu.camera.perspective import sample_camera_rays
        from slr_tpu.render.pt import trace_radiance

        w, h = 32, 24
        pid = jnp.arange(w * h, dtype=jnp.uint32)
        px = (pid % w).astype(jnp.float32) + 0.5
        py = (pid // w).astype(jnp.float32) + 0.5
        lens = jnp.full((w * h,), 0.5, jnp.float32)
        rays = sample_camera_rays(cornell.camera, px, py, w, h, lens, lens)
        sid = jnp.zeros((w * h,), jnp.uint32)
        a = trace_radiance(cornell, rays.o, rays.d, pid, sid, 7,
                           max_depth=6, sort_rays=False)
        b = trace_radiance(cornell, rays.o, rays.d, pid, sid, 7,
                           max_depth=6, sort_rays=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


class TestSharding:
    def test_shard_count_invariance(self, cornell_bvh):
        """8-device sharded render equals single-device render bit-for-bit
        modulo reduction order (counter-based RNG requirement)."""
        from slr_tpu.parallel.mesh import make_mesh, render_sharded

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        scene = cornell_bvh
        ref = np.asarray(render(scene, 16, 16, spp=1, max_depth=4))
        mesh = make_mesh(8)
        img = np.asarray(
            render_sharded(scene, 16, 16, spp=1, mesh=mesh, max_depth=4)
        )
        np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)

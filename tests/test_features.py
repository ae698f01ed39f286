"""Feature tests: bump mapping, alpha cutout, equirectangular camera, CLI."""
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.scene.build import SceneBuilder


def quad_scene(alpha_ftex=-1, normal_ntex=-1, two_walls=False):
    b = SceneBuilder()
    mat = b.add_matte(b.add_stex_const((0.8, 0.8, 0.8)))
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    nrm = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
    tan = np.tile([1.0, 0.0, 0.0], (4, 1)).astype(np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    b.add_mesh(pos, nrm, tan, uv, tris, mat, alpha_ftex=alpha_ftex,
               normal_ntex=normal_ntex)
    if two_walls:
        back = pos.copy()
        back[:, 2] = -1.0
        b.add_mesh(back, nrm, tan, uv, tris, mat)
    b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 1.0)
    return b


class TestBumpMapping:
    def test_checker_normal_perturbs_frame(self):
        from slr_tpu.render.pt import resolve_sp, scene_intersect_alpha

        b = SceneBuilder()
        ntex = b.add_ntex_checker(step_width=0.5)
        mat = b.add_matte(b.add_stex_const((0.8, 0.8, 0.8)))
        pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
        nrm = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
        tan = np.tile([1.0, 0.0, 0.0], (4, 1)).astype(np.float32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        b.add_mesh(pos, nrm, tan, uv, tris, mat, normal_ntex=ntex)
        b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 1.0)
        scene = b.build(use_bvh=False)
        assert scene.has_normal_map
        o = jnp.array([[0.1, 0.1, 2.0], [0.26, 0.26, 2.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        hit = scene_intersect_alpha(scene, o, d)
        sp = resolve_sp(scene, hit, o, d)
        n = np.asarray(sp.sn)
        # frames stay unit-length and orthogonal after perturbation
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
        t = np.asarray(sp.tangent)
        dots = np.abs((n * t).sum(-1))
        assert (dots < 1e-4).all()

    def test_flat_normal_map_is_identity(self):
        from slr_tpu.scene.textures import eval_normal_texture

        b = quad_scene()
        # flat normal map image: rgb (0.5, 0.5, 1.0) -> normal (0,0,1)
        img = np.full((4, 4, 3), 0.5, np.float32)
        img[..., 2] = 1.0
        iid = b.add_image(img)
        nid = b.add_ntex_image(iid)
        scene = b.build(use_bvh=False)
        n = eval_normal_texture(
            scene.ntex, scene.stex.images, scene.stex.image_hw,
            jnp.array([nid]), jnp.array([[0.3, 0.7]]),
        )
        np.testing.assert_allclose(np.asarray(n)[0], [0, 0, 1], atol=1e-5)


class TestAlphaCutout:
    def test_zero_alpha_passes_through(self):
        from slr_tpu.render.pt import scene_intersect_alpha

        # front wall fully transparent (alpha texture = 0), back wall opaque
        b = SceneBuilder()
        mat = b.add_matte(b.add_stex_const((0.8, 0.8, 0.8)))
        a0 = b.add_ftex_const(0.0)
        pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
        nrm = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
        tan = np.tile([1.0, 0.0, 0.0], (4, 1)).astype(np.float32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        b.add_mesh(pos, nrm, tan, uv, tris, mat, alpha_ftex=a0)
        back = pos.copy()
        back[:, 2] = -1.0
        b.add_mesh(back, nrm, tan, uv, tris, mat)
        b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 1.0)
        scene = b.build(use_bvh=False)
        assert scene.has_alpha

        o = jnp.array([[0.0, 0.0, 2.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = scene_intersect_alpha(scene, o, d)
        # passes through the transparent quad, hits the back wall at z=-1
        assert bool(hit.mask[0])
        np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-4)


class TestEquirectCamera:
    def test_full_sphere_coverage(self):
        from slr_tpu.render.pt import render
        from slr_tpu.scene.presets import env_sphere_scene, uv_sphere
        from slr_tpu.scene.build import SceneBuilder

        b = SceneBuilder()
        mat = b.add_matte(b.add_stex_const((0.5, 0.5, 0.5)))
        pos, nrm, tan, uv, tris = uv_sphere((0, 0, -3), 1.0, 8, 16)
        b.add_mesh(pos, nrm, tan, uv, tris, mat)
        img = np.ones((8, 16, 3), np.float32)
        tex = b.add_stex_image(b.add_image(img))
        b.set_environment(tex, 1.0)
        b.set_camera_equirect(np.eye(4, dtype=np.float32))
        scene = b.build(use_bvh=False)
        out = np.asarray(render(scene, 32, 16, spp=1, max_depth=2))
        assert np.isfinite(out).all()
        assert (out > 0).mean() > 0.9  # sky visible nearly everywhere


class TestCLI:
    def test_cli_renders_scene(self, tmp_path):
        res = subprocess.run(
            [sys.executable, "-m", "slr_tpu",
             "/root/reference/TestScenes/Cornell_Box_Spheres.txt",
             "--spp", "1", "--width", "32", "--height", "24",
             "--out", str(tmp_path), "--renderer", "pt", "--max-depth", "3",
             "--cpu", "--check"],
            capture_output=True, text=True, timeout=500,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert (tmp_path / "000.png").exists()


class TestDeepAlphaCutout:
    def test_six_layer_cutout(self):
        """A ray passing through 6 fully-cut-out quads must reach the 7th
        solid one — the recast loop is unbounded (lax.while_loop), unlike
        round-1's fixed 4 rounds (TriangleMesh.cpp:163-168 loops until
        resolution)."""
        import numpy as np
        import jax.numpy as jnp
        from slr_tpu.scene.build import SceneBuilder
        from slr_tpu.render.pt import scene_intersect_alpha

        b = SceneBuilder()
        refl = b.add_stex_const((0.5, 0.5, 0.5))
        mat = b.add_matte(refl)
        cut = b.add_ftex_const(0.0)   # alpha == 0 -> fully cut out
        nrm = np.tile(np.float32([0, 0, 1]), (4, 1))
        tan = np.tile(np.float32([1, 0, 0]), (4, 1))
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        for i in range(7):
            z = float(i)
            pos = np.array([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                           np.float32)
            b.add_mesh(pos, nrm, tan, uv, tris, mat,
                       alpha_ftex=(cut if i < 6 else -1))
        b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
        scene = b.build(use_bvh=False)
        o = jnp.asarray([[0.1, 0.1, -1.0]] * 4, jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]] * 4, jnp.float32)
        hit = scene_intersect_alpha(scene, o, d)
        assert bool(hit.mask.all())
        np.testing.assert_allclose(np.asarray(hit.t), 7.0, atol=1e-4)


class TestEquirectEverywhere:
    """Round-2 VERDICT item 6: the equirectangular camera must work through
    EVERY renderer entry point (EquirectangularCamera.cpp:30-91 works
    anywhere the reference queries a camera)."""

    @staticmethod
    def _scene():
        from slr_tpu.scene.build import SceneBuilder

        b = SceneBuilder()
        mat = b.add_matte(b.add_stex_const((0.6, 0.4, 0.3)))
        em = b.add_stex_const((8.0, 8.0, 8.0))
        emitter = b.add_emitter(b.add_matte(b.add_stex_const((0.5,) * 3)), em)
        # room box (inward normals) + emissive ceiling panel
        s = 2.0
        pos = np.float32([
            [-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
            [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
        ])
        quads = [(0, 1, 2, 3), (5, 4, 7, 6), (4, 0, 3, 7),
                 (1, 5, 6, 2), (4, 5, 1, 0)]
        for q in quads:
            qpos = pos[list(q)]
            n = np.cross(qpos[1] - qpos[0], qpos[2] - qpos[0])
            n = (n / np.linalg.norm(n)).astype(np.float32)
            nrm = np.tile(n, (4, 1))
            tan = np.tile(np.float32([1, 0, 0] if abs(n[0]) < 0.9
                                     else [0, 1, 0]), (4, 1))
            uv = np.zeros((4, 2), np.float32)
            b.add_mesh(qpos, nrm, tan, uv,
                       np.array([[0, 1, 2], [0, 2, 3]], np.int32), mat)
        ep = np.float32([[-0.5, 1.99, -0.5], [0.5, 1.99, -0.5],
                         [0.5, 1.99, 0.5], [-0.5, 1.99, 0.5]])
        nrm = np.tile(np.float32([0, -1, 0]), (4, 1))
        tan = np.tile(np.float32([1, 0, 0]), (4, 1))
        b.add_mesh(ep, nrm, tan, np.zeros((4, 2), np.float32),
                   np.array([[0, 2, 1], [0, 3, 2]], np.int32), emitter)
        b.set_camera_equirect(np.eye(4, dtype=np.float32))
        return b.build(use_bvh=False)

    def test_all_pt_entry_points_agree(self):
        """render / render_fused / render_wavefront / render_sharded on an
        equirect scene produce the same estimate (same RNG streams)."""
        import jax

        from slr_tpu.parallel.mesh import make_mesh, render_sharded
        from slr_tpu.render.pt import render, render_fused
        from slr_tpu.render.wavefront import render_wavefront

        scene = self._scene()
        w, h, spp = 16, 8, 2
        base = np.asarray(render(scene, w, h, spp=spp, max_depth=4, seed=7))
        fused = np.asarray(render_fused(scene, w, h, spp=spp, max_depth=4,
                                        seed=7))
        wf = np.asarray(render_wavefront(scene, w, h, spp=spp, max_depth=4,
                                         seed=7))
        np.testing.assert_allclose(fused, base, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(wf, base, rtol=2e-3, atol=2e-4)
        if len(jax.devices()) >= 2:
            mesh = make_mesh(len(jax.devices()))
            sh = np.asarray(render_sharded(scene, w, h, spp=spp, mesh=mesh,
                                           max_depth=4, seed=7))
            np.testing.assert_allclose(sh, base, rtol=2e-3, atol=2e-4)

    def test_bpt_converges_to_pt(self):
        """PT-vs-BPT convergence through the equirect camera (incl. t=1
        splats through the equirect calculatePixel inverse)."""
        from slr_tpu.render.bpt import render_bpt
        from slr_tpu.render.pt import render

        scene = self._scene()
        w, h = 16, 8
        pt = np.asarray(render(scene, w, h, spp=48, max_depth=4, seed=3))
        bpt = np.asarray(render_bpt(scene, w, h, spp=48, seed=3,
                                    max_light_verts=4, max_eye_verts=4))
        # block means (2x2) within MC tolerance
        ptb = pt.reshape(4, 2, 8, 2, 3).mean(axis=(1, 3))
        bptb = bpt.reshape(4, 2, 8, 2, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(bptb, ptb, rtol=0.25, atol=0.02)
        np.testing.assert_allclose(bpt.mean(), pt.mean(), rtol=0.1)

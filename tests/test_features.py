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

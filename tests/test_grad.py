"""Differentiable-rendering tests: autodiff through the path-tracing estimator
vs finite differences on material parameters (SURVEY.md §7 delta 4 + S5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.render.pt import trace_radiance
from slr_tpu.scene.presets import cornell_box_spheres


@pytest.fixture(scope="module")
def cornell():
    return cornell_box_spheres(sphere_res=6, use_bvh=False, metal=False,
                               glass=False)


def mean_radiance(scene, value, n=256, max_depth=4):
    """Scalar objective: mean radiance with the white-wall reflectance set to
    `value` (stex id 2 is the white 0.75 constant in the preset)."""
    stex = scene.stex
    new_vals = stex.value.at[2].set(jnp.full((3,), value))
    scene = scene.replace(stex=stex.replace(value=new_vals))
    rs = np.random.RandomState(0)
    o = jnp.asarray(
        np.array([[0.0, 1.2, 1.0]] * n) + rs.randn(n, 3) * 0.05, jnp.float32
    )
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    c = trace_radiance(
        scene, o, d, jnp.arange(n, dtype=jnp.uint32),
        jnp.zeros((n,), jnp.uint32), 0, max_depth=max_depth,
    )
    return jnp.mean(c)


class TestGradients:
    def test_grad_matches_finite_difference(self, cornell):
        f = lambda v: mean_radiance(cornell, v)
        g = jax.grad(f)(jnp.float32(0.75))
        eps = 1e-2
        fd = (f(jnp.float32(0.75 + eps)) - f(jnp.float32(0.75 - eps))) / (2 * eps)
        # Same RNG stream on both sides -> the FD is low-variance; detached
        # sampling gradient must agree closely.
        np.testing.assert_allclose(float(g), float(fd), rtol=0.08)
        assert float(g) > 0  # brighter walls -> brighter image

    def test_grad_of_emitter_scale(self, cornell):
        def f(scale):
            stex = cornell.stex
            # stex id 4 is the emitter constant in the preset
            new_vals = stex.value.at[4].set(jnp.full((3,), scale))
            scene = cornell.replace(stex=stex.replace(value=new_vals))
            rs = np.random.RandomState(1)
            n = 128
            o = jnp.asarray(np.array([[0.0, 1.2, 1.0]] * n), jnp.float32)
            d = jnp.asarray(rs.randn(n, 3), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            c = trace_radiance(
                scene, o, d, jnp.arange(n, dtype=jnp.uint32),
                jnp.zeros((n,), jnp.uint32), 0, max_depth=3,
            )
            return jnp.mean(c)

        g = jax.grad(f)(jnp.float32(30.0))
        # Radiance is linear in the emitter: grad == f(s)/s exactly.
        val = f(jnp.float32(30.0))
        np.testing.assert_allclose(float(g), float(val) / 30.0, rtol=1e-4)

    def test_jit_grad_compiles(self, cornell):
        g = jax.jit(jax.grad(lambda v: mean_radiance(cornell, v, n=64,
                                                     max_depth=2)))
        out = g(jnp.float32(0.5))
        assert np.isfinite(float(out))


class TestPixelGradients:
    """S5-level acceptance: whole *gradient images* (not scalars) against
    finite differences, through the fused whole-frame renderer."""

    def test_pixel_gradient_map_vs_fd(self, cornell):
        """Whole gradient image w.r.t. the emitter scale through the fused
        renderer. No sampling decision depends on the emitter (RR importance
        tracks throughput only), so the FD uses identical paths on both
        sides and the per-pixel comparison is tight — unlike reflectance
        parameters, whose FD flips discrete RR decisions."""
        from slr_tpu.render.pt import render_fused

        w, h, spp = 16, 12, 8

        def f(v):
            stex = cornell.stex
            new_vals = stex.value.at[4].set(jnp.full((3,), v))
            scene = cornell.replace(stex=stex.replace(value=new_vals))
            return render_fused(scene, w, h, spp=spp, max_depth=3)

        v0 = jnp.float32(30.0)
        img, dimg = jax.jvp(f, (v0,), (jnp.float32(1.0),))
        eps = 0.5
        fd = (f(v0 + eps) - f(v0 - eps)) / (2 * eps)
        dimg = np.asarray(dimg)
        fd = np.asarray(fd)
        assert np.isfinite(dimg).all()
        np.testing.assert_allclose(
            dimg, fd, rtol=2e-3, atol=1e-5 * float(np.abs(fd).max())
        )
        # Linearity cross-check: d(img)/d(scale) == img / scale per pixel.
        np.testing.assert_allclose(
            dimg, np.asarray(img) / 30.0, rtol=2e-3,
            atol=1e-5 * float(np.abs(fd).max()),
        )
        assert float(np.abs(dimg).max()) > 1e-4

    def test_pixel_gradient_reflectance_mean(self, cornell):
        """Reflectance-parameter gradient image: FD crosses RR decision
        boundaries per-texel, so assert agreement of the image MEAN and that
        most texels match (the detached estimator has no boundary terms)."""
        from slr_tpu.render.pt import render_fused

        w, h, spp = 16, 12, 8

        def f(v):
            stex = cornell.stex
            new_vals = stex.value.at[2].set(jnp.full((3,), v))
            scene = cornell.replace(stex=stex.replace(value=new_vals))
            return render_fused(scene, w, h, spp=spp, max_depth=3)

        v0 = jnp.float32(0.75)
        _, dimg = jax.jvp(f, (v0,), (jnp.float32(1.0),))
        eps = 5e-3
        fd = (f(v0 + eps) - f(v0 - eps)) / (2 * eps)
        dimg = np.asarray(dimg)
        fd = np.asarray(fd)
        assert np.isfinite(dimg).all()
        close = np.isclose(dimg, fd, rtol=0.05,
                           atol=0.02 * float(np.abs(fd).max()))
        assert close.mean() > 0.7, f"only {close.mean():.2%} texels agree"
        np.testing.assert_allclose(dimg.mean(), fd.mean(), rtol=0.25)

    def test_spectral_gradient(self):
        scene = cornell_box_spheres(sphere_res=6, use_bvh=False, metal=False,
                                    glass=False, spectral=True)

        # The spectral emitter texture id comes from the material table by
        # construction (the preset's only emissive material), not from a
        # global "the only CURVE" scan — spectral builds pre-tabulate every
        # constant spectrum into a CURVE row, so there are many.
        from slr_tpu.scene.types import STexKind

        emit_ids = np.unique(
            np.asarray(scene.materials.emit_stex)
        )
        emit_ids = emit_ids[emit_ids >= 0]
        assert len(emit_ids) == 1
        emit_id = int(emit_ids[0])
        assert int(scene.stex.kind[emit_id]) == int(STexKind.CURVE)

        def f(s):
            stex = scene.stex
            new_vals = stex.value.at[emit_id, 0].mul(s)
            sc = scene.replace(stex=stex.replace(value=new_vals))
            rs = np.random.RandomState(2)
            n = 64
            o = jnp.asarray(np.array([[0.0, 1.2, 1.0]] * n), jnp.float32)
            d = jnp.asarray(rs.randn(n, 3), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            c = trace_radiance(
                sc, o, d, jnp.arange(n, dtype=jnp.uint32),
                jnp.zeros((n,), jnp.uint32), 0, max_depth=3,
            )
            return jnp.mean(c)

        g = jax.grad(f)(jnp.float32(1.0))
        val = f(jnp.float32(1.0))
        np.testing.assert_allclose(float(g), float(val), rtol=1e-3)

    def test_checker_texture_gradient(self):
        """Gradient w.r.t. a procedural texture parameter (checker color)."""
        from slr_tpu.scene.build import SceneBuilder
        from slr_tpu.render.pt import trace_radiance

        b = SceneBuilder()
        chk = b.add_stex_checker((0.2, 0.2, 0.2), (0.8, 0.8, 0.8))
        mat = b.add_matte(chk)
        pos = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                       np.float32)
        nrm = np.tile(np.float32([0, 0, 1]), (4, 1))
        tan = np.tile(np.float32([1, 0, 0]), (4, 1))
        uv = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
        b.add_mesh(pos, nrm, tan, uv, np.array([[0, 1, 2], [0, 2, 3]],
                                               np.int32), mat)
        em = b.add_stex_const((5.0, 5.0, 5.0))
        epos = pos * 0.5 + np.float32([0, 0, 3])
        b.add_mesh(epos, -nrm, tan, uv,
                   np.array([[0, 2, 1], [0, 3, 2]], np.int32),
                   b.add_emitter(b.add_matte(chk), em))
        b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
        scene = b.build(use_bvh=False)

        def f(c0):
            stex = scene.stex
            new_vals = stex.value.at[0].set(jnp.full((3,), c0))
            sc = scene.replace(stex=stex.replace(value=new_vals))
            n = 128
            rs = np.random.RandomState(3)
            o = jnp.asarray(np.array([[0.0, 0.0, 1.5]] * n), jnp.float32)
            d = jnp.asarray(rs.randn(n, 3) - [0, 0, 1], jnp.float32)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            c = trace_radiance(
                sc, o, d, jnp.arange(n, dtype=jnp.uint32),
                jnp.zeros((n,), jnp.uint32), 0, max_depth=3,
            )
            return jnp.mean(c)

        g = jax.grad(f)(jnp.float32(0.2))
        eps = 1e-2
        fd = (f(jnp.float32(0.2 + eps)) - f(jnp.float32(0.2 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.08)
        assert float(g) > 0


class TestExtendedGradients:
    """Round-2 VERDICT item 2 extension: gradients through an IMAGE texture
    and through tabulated spectral reflectance curves (the Cornell_Box_
    ColorChecker material parameterization), each against finite
    differences."""

    def test_image_texture_gradient(self):
        """d(mean radiance)/d(image texels) through bilinear IMAGE sampling
        vs FD on a global image scale."""
        from slr_tpu.scene.build import SceneBuilder

        b = SceneBuilder()
        img = np.full((8, 8, 4), 0.5, np.float32)
        tex = b.add_stex_image(b.add_image(img))
        mat = b.add_matte(tex)
        pos = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                       np.float32)
        nrm = np.tile(np.float32([0, 0, 1]), (4, 1))
        tan = np.tile(np.float32([1, 0, 0]), (4, 1))
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        b.add_mesh(pos, nrm, tan, uv,
                   np.array([[0, 1, 2], [0, 2, 3]], np.int32), mat)
        em = b.add_stex_const((5.0, 5.0, 5.0))
        epos = pos * 0.5 + np.float32([0, 0, 3])
        b.add_mesh(epos, -nrm, tan, uv,
                   np.array([[0, 2, 1], [0, 3, 2]], np.int32),
                   b.add_emitter(
                       b.add_matte(b.add_stex_const((0.5, 0.5, 0.5))), em))
        b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
        scene = b.build(use_bvh=False)

        # Depth 2 keeps RR inactive on these short paths: the detached
        # estimator has no boundary terms for RR-decision flips, so deeper
        # FD comparisons need far more samples.
        def f(scale):
            st = scene.stex
            sc = scene.replace(stex=st.replace(images=st.images * scale))
            n = 256
            rs = np.random.RandomState(5)
            o = jnp.asarray(np.array([[0.0, 0.0, 1.5]] * n), jnp.float32)
            d = jnp.asarray(rs.randn(n, 3) - [0, 0, 1], jnp.float32)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            c = trace_radiance(
                sc, o, d, jnp.arange(n, dtype=jnp.uint32),
                jnp.zeros((n,), jnp.uint32), 0, max_depth=2,
            )
            return jnp.mean(c)

        g = jax.grad(f)(jnp.float32(1.0))
        eps = 1e-2
        fd = (f(jnp.float32(1 + eps)) - f(jnp.float32(1 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.08)
        assert float(g) > 0

    def test_spectral_curve_gradient(self):
        """Spectral-mode gradient through a tabulated reflectance CURVE
        (the ColorChecker patches are CURVE textures after build
        pre-tabulation) vs FD on a curve scale."""
        scene = cornell_box_spheres(sphere_res=6, use_bvh=False, metal=False,
                                    glass=False, spectral=True)

        def f(s):
            st = scene.stex
            sc = scene.replace(stex=st.replace(curves_v=st.curves_v * s))
            rs = np.random.RandomState(6)
            n = 64
            o = jnp.asarray(np.array([[0.0, 1.2, 1.0]] * n), jnp.float32)
            d = jnp.asarray(rs.randn(n, 3), jnp.float32)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            c = trace_radiance(
                sc, o, d, jnp.arange(n, dtype=jnp.uint32),
                jnp.zeros((n,), jnp.uint32), 0, max_depth=3,
            )
            return jnp.mean(c)

        g = jax.grad(f)(jnp.float32(1.0))
        eps = 5e-3
        fd = (f(jnp.float32(1 + eps)) - f(jnp.float32(1 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.1)
        assert np.isfinite(float(g)) and float(g) != 0.0

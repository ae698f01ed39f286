"""Environment-light (IBL) tests: direction mapping round trip, constant-env
analytic radiance, and MIS consistency between env NEE and BSDF sampling."""
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.render.pt import (
    _env_direction,
    _env_uv_from_direction,
    render,
    trace_radiance,
)
from slr_tpu.scene.presets import env_sphere_scene


class TestMapping:
    def test_round_trip(self):
        rs = np.random.RandomState(0)
        u = jnp.asarray(rs.rand(1000), jnp.float32)
        v = jnp.asarray(rs.rand(1000) * 0.98 + 0.01, jnp.float32)
        d = _env_direction(u * 2 * np.pi, v * np.pi)
        u2, v2 = _env_uv_from_direction(d)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5
        )


class TestConstantEnv:
    def test_background_radiance(self):
        """Rays that miss geometry return exactly the env radiance."""
        scene = env_sphere_scene(env_scale=2.0)
        n = 16
        o = jnp.broadcast_to(jnp.array([0.0, 0.0, -4.0]), (n, 3))
        # aim away from the sphere
        d = jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0]), (n, 3)
        )
        c = trace_radiance(
            scene, o, d, jnp.arange(n, dtype=jnp.uint32),
            jnp.zeros((n,), jnp.uint32), 0, max_depth=2,
        )
        np.testing.assert_allclose(np.asarray(c), 2.0, rtol=1e-4)

    def test_sphere_radiance_analytic(self):
        """Convex Lambert sphere under constant env L: L_out = rho * L."""
        rho = 0.6
        scene = env_sphere_scene(reflectance=rho, env_scale=1.0)
        n = 512
        rs = np.random.RandomState(1)
        # rays at the sphere from the camera side
        px = rs.rand(n) * 0.4 - 0.2
        py = rs.rand(n) * 0.4 - 0.2
        o = jnp.asarray(np.stack([px, py, np.full(n, -4.0)], -1), jnp.float32)
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        c = trace_radiance(
            scene, o, d, jnp.arange(n, dtype=jnp.uint32),
            jnp.zeros((n,), jnp.uint32), 0, max_depth=16,
        )
        est = float(jnp.mean(c))
        np.testing.assert_allclose(est, rho, rtol=0.05)

    def test_full_render_finite(self):
        scene = env_sphere_scene()
        img = np.asarray(render(scene, 24, 24, spp=2, max_depth=4))
        assert np.isfinite(img).all()
        # sky radiance 1.0 arrives attenuated only by the camera importance
        assert img.mean() > 0.1


class TestImportanceSampledEnv:
    def test_sun_disc_env(self):
        """A tiny bright 'sun' region: importance sampling must find it (low
        variance vs the analytic direct estimate)."""
        img = np.full((32, 64, 3), 0.01, np.float32)
        # Sun texel at (u=0.5, v=0.5): direction (0,0,-1), i.e. behind the
        # camera, fully lighting the visible cap of the sphere.
        img[16, 32] = 500.0
        scene = env_sphere_scene(env_image=img, reflectance=0.5)
        n = 256
        o = jnp.broadcast_to(jnp.array([0.0, 0.0, -4.0]), (n, 3))
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        c = trace_radiance(
            scene, o, d, jnp.arange(n, dtype=jnp.uint32),
            jnp.zeros((n,), jnp.uint32), 0, max_depth=3,
        )
        a = np.asarray(c)
        assert np.isfinite(a).all()
        # Analytic direct estimate: L = rho/pi * L_sun * domega * cos with
        # domega = (2pi/64)(pi/32), cos ~ 1 at the cap center -> ~0.77.
        domega = (2 * np.pi / 64) * (np.pi / 32)
        expected = 0.5 / np.pi * 500.0 * domega
        assert a.mean() > 0.5 * expected
        assert a.mean() < 3.0 * expected

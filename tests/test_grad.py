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

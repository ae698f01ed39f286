"""Per-piece profile of bsdf_sample/bsdf_pdf internals on the real chip."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(label, fn, *args, n=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return dt


def main():
    import slr_tpu.bsdf.lobes as lb
    from slr_tpu.bsdf.bsdf import (
        _eval_internal_all, _pdf_internal_all, _sanitized, lobe_weights,
        gather_lobes,
    )
    from slr_tpu.bsdf.lobes import LobeKind
    from slr_tpu.scene.presets import cornell_box_spheres
    from slr_tpu.render.pt import scene_intersect_alpha, resolve_sp

    scene = cornell_box_spheres(sphere_res=24, use_bvh=False)
    r = 512 * 384
    key = jax.random.PRNGKey(0)
    wo = jax.random.normal(key, (r, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = jnp.roll(wo, 1, axis=0)
    gn = jnp.zeros((r, 3)).at[:, 2].set(1.0)
    hero = jnp.zeros((r,), jnp.int32)
    u = jnp.full((r,), 0.37, jnp.float32)
    front = wo[:, 2] > 0

    px = (jnp.arange(r) % 512).astype(jnp.float32)
    py = (jnp.arange(r) // 512).astype(jnp.float32)
    from slr_tpu.camera.perspective import sample_camera_rays
    rays = sample_camera_rays(scene.camera, px, py, 512, 384, u, u)
    hit = jax.jit(lambda: scene_intersect_alpha(scene, rays.o, rays.d))()
    sp = jax.jit(lambda: resolve_sp(scene, hit, rays.o, rays.d))()
    lobes = jax.jit(lambda: gather_lobes(scene, sp.mat_id, sp.uv, sp.p, None))()
    jax.tree.map(lambda x: x.block_until_ready(), lobes)

    picked = jax.tree.map(lambda x: x[:, 0], lobes)

    timeit("lobe_weights", jax.jit(lambda: lobe_weights(lobes, wo, hero)))
    timeit("_pdf_internal_all", jax.jit(
        lambda: _pdf_internal_all(lobes, wo, wi, hero)))
    timeit("_eval_internal_all", jax.jit(
        lambda: _eval_internal_all(lobes, wo, wi, hero)))

    def san(kind):
        return _sanitized(picked, kind)

    timeit("lambert_sample", jax.jit(
        lambda: lb.lambert_sample(san(LobeKind.LAMBERT), wo, front, u, u)))
    timeit("oren_nayar_sample", jax.jit(
        lambda: lb.oren_nayar_sample(san(LobeKind.OREN_NAYAR), wo, front, u, u)))
    timeit("specular_reflection_sample", jax.jit(
        lambda: lb.specular_reflection_sample(
            san(LobeKind.SPECULAR_REFLECTION), wo)))
    timeit("specular_scattering_sample", jax.jit(
        lambda: lb.specular_scattering_sample(
            san(LobeKind.SPECULAR_SCATTERING), wo, hero, u)))
    timeit("microfacet_reflection_sample", jax.jit(
        lambda: lb.microfacet_reflection_sample(
            san(LobeKind.MICROFACET_REFLECTION), wo, u, u)))
    timeit("microfacet_scattering_sample", jax.jit(
        lambda: lb.microfacet_scattering_sample(
            san(LobeKind.MICROFACET_SCATTERING), wo, hero, u, u, u)))
    timeit("ward_sample", jax.jit(
        lambda: lb.ward_sample(san(LobeKind.WARD), wo, u, u)))
    timeit("ashikhmin_sample", jax.jit(
        lambda: lb.ashikhmin_sample(
            san(LobeKind.ASHIKHMIN), wo, front, hero, u, u, u)))


if __name__ == "__main__":
    main()

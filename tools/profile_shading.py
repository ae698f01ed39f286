"""Microbenchmarks for the per-bounce shading pieces on the real chip."""
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
    from slr_tpu.scene.presets import cornell_box_spheres
    from slr_tpu.render.pt import (
        resolve_sp, scene_intersect_alpha, _select_light,
    )
    from slr_tpu.bsdf.bsdf import (
        bsdf_evaluate, bsdf_pdf, bsdf_sample, emitted_radiance, gather_lobes,
    )
    from slr_tpu.accel.intersect import sample_triangle_point
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.core import rng
    from slr_tpu.core.rng import Decision
    from slr_tpu.core.math3d import frame_to_local

    width, height = 512, 384
    scene = cornell_box_spheres(sphere_res=24, use_bvh=False)
    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.float32) + 0.5
    py = (pixel_id // width).astype(jnp.float32) + 0.5
    lens = jnp.full((n_pix,), 0.5, jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, width, height, lens, lens)
    o, d = rays.o, rays.d
    seed = jnp.uint32(0)
    sample_id = jnp.zeros((n_pix,), jnp.uint32)

    hit = jax.jit(lambda o, d: scene_intersect_alpha(scene, o, d))(o, d)
    jax.tree.map(lambda x: x.block_until_ready(), hit)

    f_sp = jax.jit(lambda h: resolve_sp(scene, h, o, d))
    timeit("resolve_sp", f_sp, hit)
    sp = f_sp(hit)

    f_lob = jax.jit(lambda sp: gather_lobes(scene, sp.mat_id, sp.uv, sp.p, None))
    timeit("gather_lobes", f_lob, sp)
    lobes = f_lob(sp)

    wo = jax.jit(lambda: frame_to_local(sp.tangent, sp.bitangent, sp.sn, -d))()
    gn_sn = jax.jit(lambda: frame_to_local(sp.tangent, sp.bitangent, sp.sn, sp.gn))()
    hero = jnp.zeros((n_pix,), jnp.int32)
    wl_sel = jnp.zeros((n_pix,), bool)
    u = jnp.full((n_pix,), 0.37, jnp.float32)

    timeit("bsdf_evaluate", jax.jit(
        lambda: bsdf_evaluate(lobes, wo, wo, gn_sn, hero)))
    timeit("bsdf_pdf", jax.jit(lambda: bsdf_pdf(lobes, wo, wo, gn_sn, hero)))
    timeit("bsdf_sample", jax.jit(
        lambda: bsdf_sample(lobes, wo, gn_sn, hero, wl_sel, u, u, u)))
    timeit("emitted_radiance", jax.jit(
        lambda: emitted_radiance(scene, sp.mat_id, sp.uv, u, None)))
    timeit("select+sample light point", jax.jit(
        lambda: sample_triangle_point(
            scene.geometry, _select_light(scene, u)[0], u, u)))
    timeit("rng.uniform x9", jax.jit(lambda: [
        rng.uniform(seed, pixel_id, sample_id, jnp.uint32(1), dec)
        for dec in (Decision.LIGHT_SELECT, Decision.LIGHT_POS_U,
                    Decision.LIGHT_POS_V, Decision.BSDF_COMPONENT,
                    Decision.BSDF_U, Decision.BSDF_V, Decision.RR,
                    Decision.WL_SELECT, Decision.WAVELENGTH)]))
    timeit("frame_to_local x2", jax.jit(lambda: (
        frame_to_local(sp.tangent, sp.bitangent, sp.sn, -d),
        frame_to_local(sp.tangent, sp.bitangent, sp.sn, sp.gn))))


if __name__ == "__main__":
    main()

"""Breakdown profile on the real chip: intersect kernel vs full render.

Times each stage of the Cornell bench configuration so kernel work can be
separated from shading/film overhead. Run: python tools/profile_tpu.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    from slr_tpu.scene.presets import cornell_box_spheres
    from slr_tpu.render.pt import render, trace_radiance
    from slr_tpu.accel.pallas_intersect import intersect_pallas, anyhit_pallas
    from slr_tpu.camera.perspective import sample_camera_rays

    width, height, spp, max_depth = 512, 384, 4, 8
    scene = cornell_box_spheres(sphere_res=24)
    n_tris = int((scene.pallas_tris.remap >= 0).sum())
    print(f"tri-refs={n_tris} chunks={scene.pallas_tris.n_chunks} "
          f"chunk={scene.pallas_tris.chunk}")

    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.float32) + 0.5
    py = (pixel_id // width).astype(jnp.float32) + 0.5
    lens = jnp.full((n_pix,), 0.5, jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, width, height, lens, lens)
    o, d = rays.o, rays.d

    geom = scene.geometry
    pt_tab = scene.pallas_tris

    f_hit = jax.jit(lambda o, d: intersect_pallas(geom, pt_tab, o, d))
    f_any = jax.jit(lambda o, d: anyhit_pallas(geom, pt_tab, o, d, tmax=10.0))

    dt_hit = timeit("closest-hit cast (196k rays)", f_hit, o, d)
    dt_any = timeit("any-hit cast (196k rays)", f_any, o, d)

    sample_id = jnp.zeros((n_pix,), jnp.uint32)
    f_tr = jax.jit(lambda o, d: trace_radiance(
        scene, o, d, pixel_id, sample_id, 0, max_depth=max_depth))
    dt_tr = timeit(f"trace_radiance depth={max_depth}", f_tr, o, d)

    f_render = lambda: render(scene, width, height, spp=spp,
                              max_depth=max_depth, seed=1)
    dt_r = timeit(f"render spp={spp}", f_render, n=2)

    from slr_tpu.render.wavefront import render_wavefront

    img, iters = render_wavefront(scene, width, height, spp=spp, seed=1,
                                  return_iters=True)
    jax.block_until_ready(img)
    import time as _t
    t0 = _t.perf_counter()
    img, iters = render_wavefront(scene, width, height, spp=spp, seed=1,
                                  return_iters=True)
    jax.block_until_ready(img)
    dt_w = _t.perf_counter() - t0
    print(f"{'render_wavefront spp=' + str(spp):40s} {dt_w*1e3:9.2f} ms "
          f"({iters} iters)")
    print(f"wavefront samples/s:              {n_pix*spp/dt_w/1e3:.0f} k")

    casts = 1 + 2 * max_depth
    print(f"\nper-sample intersect lower bound: "
          f"{(dt_hit * (1 + max_depth) + dt_any * max_depth)*1e3:.2f} ms")
    print(f"trace_radiance per sample:        {dt_tr*1e3:.2f} ms")
    print(f"render per sample:                {dt_r/spp*1e3:.2f} ms")
    print(f"rays/s in closest-hit kernel:     {n_pix/dt_hit/1e6:.2f} Mrays/s")
    print(f"ray-tri tests/s (closest):        "
          f"{n_pix*scene.pallas_tris.n_chunks*scene.pallas_tris.chunk/dt_hit/1e9:.1f} G/s (pre-cull)")


if __name__ == "__main__":
    main()

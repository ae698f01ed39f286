"""Per-stage breakdown on the bench configuration (parity scene, spectral,
256x192): where does the 311 ms/pass actually go?

Run: python tools/profile_parity.py
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
    jax.tree.map(lambda x: jax.block_until_ready(x), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: jax.block_until_ready(x), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:44s} {dt*1e3:9.2f} ms")
    return dt


def main():
    from slr_tpu.scene.api import load_scene
    from slr_tpu.render.pt import render, render_batch, scene_intersect
    from slr_tpu.render.wavefront import render_wavefront
    from slr_tpu.accel.pallas_intersect import (
        intersect_pallas, anyhit_pallas, _pack_rays, _chunk_worklist,
        _ray_ranges, worklist_stats)
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.bsdf.bsdf import gather_lobes, bsdf_evaluate, bsdf_pdf, bsdf_sample, bsdf_has_nondelta
    from slr_tpu.accel.intersect import RAY_EPSILON

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    SCENE = os.path.join(REPO, "tests/parity_scenes/Cornell_Box_Parity.txt")
    width, height, spp, max_depth = 256, 192, 8, 16
    scene, _, _ = load_scene(SCENE, spectral=True)
    pt_tab = scene.pallas_tris
    print(f"chunks={pt_tab.n_chunks} chunk={pt_tab.chunk} "
          f"tris={int((pt_tab.remap >= 0).sum())}")

    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.float32) + 0.5
    py = (pixel_id // width).astype(jnp.float32) + 0.5
    lens = jnp.full((n_pix,), 0.5, jnp.float32)
    w_j = jnp.uint32(width)
    h_j = jnp.uint32(height)
    rays = sample_camera_rays(scene.camera, px, py, w_j, h_j, lens, lens)
    o, d = rays.o, rays.d
    geom = scene.geometry

    stats = worklist_stats(pt_tab, o, d)
    print("primary worklist:", stats)

    f_hit = jax.jit(lambda o, d: intersect_pallas(geom, pt_tab, o, d))
    f_any = jax.jit(lambda o, d: anyhit_pallas(geom, pt_tab, o, d, tmax=10.0))
    dt_hit = timeit("closest-hit cast (49k rays)", f_hit, o, d)
    dt_any = timeit("any-hit cast (49k rays)", f_any, o, d)

    # worklist build alone
    @jax.jit
    def wl_only(o, d):
        tmin_a, tmax_a = _ray_ranges(o.shape[0], RAY_EPSILON, jnp.inf, None)
        rr, _ = _pack_rays(o, d, tmin_a, tmax_a, 256)
        return _chunk_worklist(rr, pt_tab.boxes)
    dt_wl = timeit("worklist build alone", wl_only, o, d)

    # shading stages on a plausible hit wavefront
    from slr_tpu.render.pt import scene_intersect_alpha, resolve_sp
    from slr_tpu.spectrum.spectral import sample_wavelengths
    hit = jax.jit(lambda o, d: scene_intersect_alpha(scene, o, d))(o, d)
    sp = jax.jit(lambda h, o, d: resolve_sp(scene, h, o, d))(hit, o, d)
    u = jnp.linspace(0, 1, n_pix)
    wls = sample_wavelengths(u, u)
    lam = wls.lambdas
    hero = wls.hero

    f_gl = jax.jit(lambda uv, p, lam: gather_lobes(scene, sp.mat_id, uv, p, lam))
    dt_gl = timeit("gather_lobes (49k)", f_gl, sp.uv, sp.p, lam)

    lobes = f_gl(sp.uv, sp.p, lam)
    wo = jnp.tile(jnp.array([[0.3, 0.2, 0.93]], jnp.float32), (n_pix, 1))
    gn = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n_pix, 1))
    f_ev = jax.jit(lambda l: bsdf_evaluate(l, wo, wo, gn, hero))
    f_pdf = jax.jit(lambda l: bsdf_pdf(l, wo, wo, gn, hero))
    f_smp = jax.jit(lambda l: bsdf_sample(l, wo, gn, hero,
                                          jnp.zeros((n_pix,), bool), u, u, u))
    dt_ev = timeit("bsdf_evaluate (49k)", f_ev, lobes)
    dt_pdf = timeit("bsdf_pdf (49k)", f_pdf, lobes)
    dt_smp = timeit("bsdf_sample (49k)", f_smp, lobes)

    f_rsp = jax.jit(lambda h, o, d: resolve_sp(scene, h, o, d))
    dt_rsp = timeit("resolve_sp (49k)", f_rsp, hit, o, d)

    # one full render_batch pass
    sample_id = jnp.zeros((n_pix,), jnp.uint32)
    f_rb = jax.jit(lambda pid, sid: render_batch(
        scene, pid, sid, jnp.uint32(1), w_j, h_j, 16))
    dt_rb = timeit("render_batch pass (16 bounces)", f_rb, pixel_id, sample_id)

    per_bounce_fixed = dt_hit + dt_any + dt_gl + dt_ev + dt_pdf + dt_smp + dt_rsp
    print(f"\nsum of measured stages x16 bounces:      "
          f"{per_bounce_fixed*16*1e3:9.2f} ms")
    print(f"render_batch / bounce:                   {dt_rb/16*1e3:9.2f} ms")

    # full render + wavefront comparison at spp
    f_r = lambda: render(scene, width, height, spp=spp, max_depth=16, seed=1)
    dt_r = timeit(f"pt.render spp={spp}", f_r, n=2)
    print(f"pt.render ksamples/s:     {n_pix*spp/dt_r/1e3:.1f}")

    img, iters = render_wavefront(scene, width, height, spp=spp, seed=1,
                                  return_iters=True)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img, iters = render_wavefront(scene, width, height, spp=spp, seed=1,
                                  return_iters=True)
    jax.block_until_ready(img)
    dt_w = time.perf_counter() - t0
    print(f"render_wavefront spp={spp}: {dt_w*1e3:.2f} ms ({iters} iters) "
          f"=> {n_pix*spp/dt_w/1e3:.1f} ksamples/s")


if __name__ == "__main__":
    main()

"""Per-stage breakdown of a wavefront iteration on the RTC3-class grass
scene at the shipped lane count (49152). Mirrors tools/profile_stages.py
(parity scene) — each stage loops 16x inside one jit so tunnel dispatch
overhead is amortized.

Run: python tools/profile_grass_stages.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ITER = 16


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    jax.tree.map(lambda x: jax.block_until_ready(x), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: jax.block_until_ready(x), out)
    dt = (time.perf_counter() - t0) / n / N_ITER
    print(f"{label:44s} {dt*1e3:9.3f} ms/iter")
    return dt


def loop16(stage):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, N_ITER, lambda i, c: stage(c), carry)
    return run


def main():
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.accel.pallas_intersect import (
        _pack_rays, _build_worklist, _prefetch_tables, _ray_ranges,
        _run_kernel, _run_kernel_any, _scene_exit_clamp, RAY_EPSILON)
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.bsdf.bsdf import (gather_lobes, bsdf_evaluate, bsdf_pdf,
                                   bsdf_sample)
    from slr_tpu.render.pt import (scene_intersect_alpha, resolve_sp,
                                   _ray_sort_key)

    scene = grass_field(n_side=64, blade_segments=13, animated_fraction=0.25)
    pt_tab = scene.pallas_tris
    geom = scene.geometry

    r = 49152
    w, h = 512, 384
    # Lane mix like mid-render: pixels strided across the frame.
    pid = (jnp.arange(r, dtype=jnp.uint32) * jnp.uint32(w * h // r))
    px = (pid % w).astype(jnp.float32) + 0.5
    py = (pid // w).astype(jnp.float32) + 0.5
    lens = jnp.full((r,), 0.5, jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(w),
                              jnp.uint32(h), lens, lens)
    key = _ray_sort_key(scene, rays.o, rays.d, jnp.ones((r,), bool))
    order = jnp.argsort(key)
    o, d = rays.o[order], rays.d[order]
    f = jnp.zeros((r,), jnp.float32)

    hit = jax.jit(lambda o, d: scene_intersect_alpha(scene, o, d, f=f))(o, d)
    sp = jax.jit(lambda h_, o_, d_: resolve_sp(scene, h_, o_, d_, f=f))(
        hit, o, d)
    lam = None  # RGB scene

    def st_null(c):
        oo, acc = c
        return oo, acc + oo[:, 0]
    timeit("null baseline", loop16(st_null), (o, jnp.zeros(r)))

    def st_hit(c):
        oo, acc = c
        h = scene_intersect_alpha(scene, oo, d, f=f)
        return oo + 0.0 * h.t[:, None], acc + h.t
    timeit("closest-hit total", loop16(st_hit), (o, jnp.zeros(r)))

    # shadow-like rays: from hit points toward the env (up hemisphere)
    up = jnp.tile(jnp.array([[0.2, 0.95, 0.25]], jnp.float32), (r, 1))
    up = up / jnp.linalg.norm(up, axis=1, keepdims=True)
    sp_p = jnp.where(hit.mask[:, None], sp.p, o)

    from slr_tpu.render.pt import scene_occluded

    def st_shadow(c):
        oo, acc = c
        occ = scene_occluded(scene, oo, up, RAY_EPSILON,
                             jnp.full((r,), 30.0), f=f,
                             active=jnp.ones((r,), bool))
        return oo + 0.0 * occ[:, None].astype(jnp.float32), \
            acc + occ.astype(jnp.float32)
    timeit("anyhit shadow total", loop16(st_shadow), (sp_p, jnp.zeros(r)))

    tmin_a, tmax_a = _ray_ranges(r, RAY_EPSILON, jnp.inf, None)
    tmax_c = _scene_exit_clamp(o, d, tmax_a, pt_tab.boxes)
    rr, _ = _pack_rays(o, d, tmin_a, tmax_c, 256, f=f)
    wl0, cnt0, wtn0 = jax.jit(
        lambda rr_: _build_worklist(rr_, pt_tab.boxes))(rr)
    echunk, einst, itrs = _prefetch_tables(pt_tab)
    print(f"   entries/block: mean {np.asarray(cnt0).mean():.1f} "
          f"p90 {np.percentile(np.asarray(cnt0), 90):.0f}")

    def st_kernel(c):
        rr_, acc = c
        t, idx, _i = _run_kernel(wl0, wtn0, cnt0, pt_tab.boxes, echunk,
                                 einst, itrs, rr_, pt_tab.tris, pt_tab.chunk,
                                 pt_tab.n_entries, rb=256)
        return rr_ + 0.0 * t.sum(), acc + t[:, 0, 0]
    timeit("closest kernel only", loop16(st_kernel),
           (rr, jnp.zeros(rr.shape[0])))

    def st_wl(c):
        rr_, acc = c
        wl, cnt, wtn = _build_worklist(rr_, pt_tab.boxes)
        return rr_ + 0.0 * cnt.sum().astype(jnp.float32), acc + cnt
    timeit("worklist build", loop16(st_wl),
           (rr, jnp.zeros(rr.shape[0], jnp.int32)))

    def st_sortkey(c):
        oo, acc = c
        k = _ray_sort_key(scene, oo, d, jnp.ones((r,), bool))
        return oo + 0.0 * k[:, None].astype(jnp.float32), acc + k
    timeit("sort key (contact)", loop16(st_sortkey),
           (o, jnp.zeros(r, jnp.uint32)))

    def st_sort(c):
        oo, acc = c
        k = _ray_sort_key(scene, oo, d, jnp.ones((r,), bool))
        ordr = jnp.argsort(k)
        return oo[ordr], acc + k
    timeit("sortkey+argsort+permute-o", loop16(st_sort),
           (o, jnp.zeros(r, jnp.uint32)))

    def st_rsp(c):
        t, acc = c
        h2 = hit._replace(t=hit.t + 0.0 * t)
        s2 = resolve_sp(scene, h2, o, d, f=f)
        return t + 0.0 * s2.p[:, 0], acc + s2.p[:, 0]
    timeit("resolve_sp", loop16(st_rsp), (jnp.zeros(r), jnp.zeros(r)))

    def st_gl(c):
        uv, acc = c
        l = gather_lobes(scene, sp.mat_id, uv, sp.p, lam)
        return uv + 0.0 * l.s0.sum(), acc + l.s0[..., 0].sum(axis=-1)
    timeit("gather_lobes", loop16(st_gl), (sp.uv, jnp.zeros(r)))


if __name__ == "__main__":
    main()


def rb_sweep():
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.accel.pallas_intersect import (
        _pack_rays, _build_worklist, _prefetch_tables, _ray_ranges,
        _run_kernel, _scene_exit_clamp, RAY_EPSILON)
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.render.pt import _ray_sort_key

    scene = grass_field(n_side=64, blade_segments=13, animated_fraction=0.25)
    pt_tab = scene.pallas_tris
    r = 49152
    w, h = 512, 384
    pid = (jnp.arange(r, dtype=jnp.uint32) * jnp.uint32(w * h // r))
    px = (pid % w).astype(jnp.float32) + 0.5
    py = (pid // w).astype(jnp.float32) + 0.5
    lens = jnp.full((r,), 0.5, jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(w),
                              jnp.uint32(h), lens, lens)
    key = _ray_sort_key(scene, rays.o, rays.d, jnp.ones((r,), bool))
    order = jnp.argsort(key)
    o, d = rays.o[order], rays.d[order]
    f = jnp.zeros((r,), jnp.float32)
    echunk, einst, itrs = _prefetch_tables(pt_tab)
    tmin_a, tmax_a = _ray_ranges(r, RAY_EPSILON, jnp.inf, None)
    tmax_c = _scene_exit_clamp(o, d, tmax_a, pt_tab.boxes)

    for rb in (64, 128, 256, 512):
        rr, nb = _pack_rays(o, d, tmin_a, tmax_c, rb, f=f)
        wl0, cnt0, wtn0 = jax.jit(
            lambda rr_: _build_worklist(rr_, pt_tab.boxes))(rr)
        c = np.asarray(cnt0)

        def st(cr):
            rr_, acc = cr
            t, idx, _i = _run_kernel(wl0, wtn0, cnt0, pt_tab.boxes, echunk,
                                     einst, itrs, rr_, pt_tab.tris,
                                     pt_tab.chunk, pt_tab.n_entries, rb=rb)
            return rr_ + 0.0 * t.sum(), acc + t[:, 0, 0]
        dt = timeit(f"kernel rb={rb} (mean e/b {c.mean():.0f})", loop16(st),
                    (rr, jnp.zeros(rr.shape[0])))
        print(f"   us per (block,entry): {dt*1e6/ c.sum():.3f}  "
              f"total entries {c.sum()}")


if __name__ == "__main__" and os.environ.get("RB_SWEEP"):
    rb_sweep()

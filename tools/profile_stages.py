"""On-device per-stage breakdown: each stage runs 16x inside a single
lax.fori_loop within one jit, so the axon-tunnel dispatch overhead (which
dominates per-call micro-timings) is paid once per stage, not per iteration.

Run: python tools/profile_stages.py
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

N_ITER = 64


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
    """Wrap `stage(carry) -> carry` in a 16x fori_loop jit."""
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, N_ITER, lambda i, c: stage(c), carry)
    return run


def main():
    from slr_tpu.scene.api import load_scene
    from slr_tpu.accel.pallas_intersect import (
        _pack_rays, _build_worklist, _prefetch_tables, _ray_ranges,
        _run_kernel, _run_kernel_any, intersect_pallas, anyhit_pallas)
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.bsdf.bsdf import (gather_lobes, bsdf_evaluate, bsdf_pdf,
                                   bsdf_sample, bsdf_has_nondelta)
    from slr_tpu.accel.intersect import RAY_EPSILON
    from slr_tpu.render.pt import (scene_intersect_alpha, resolve_sp,
                                   _ray_sort_key)
    from slr_tpu.spectrum.spectral import sample_wavelengths

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    SCENE = os.path.join(REPO, "tests/parity_scenes/Cornell_Box_Parity.txt")
    width, height = 256, 192
    scene, _, _ = load_scene(SCENE, spectral=True)
    pt_tab = scene.pallas_tris
    geom = scene.geometry

    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.float32) + 0.5
    py = (pixel_id // width).astype(jnp.float32) + 0.5
    lens = jnp.full((n_pix,), 0.5, jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(width),
                              jnp.uint32(height), lens, lens)
    o, d = rays.o, rays.d

    # Pre-state for shading stages
    hit = jax.jit(lambda o, d: scene_intersect_alpha(scene, o, d))(o, d)
    sp = jax.jit(lambda h, o, d: resolve_sp(scene, h, o, d))(hit, o, d)
    u = jnp.linspace(0.0, 1.0, n_pix)
    wls = sample_wavelengths(u, u)
    lam, hero = wls.lambdas, wls.hero
    wo = jnp.tile(jnp.array([[0.3, 0.2, 0.93]], jnp.float32), (n_pix, 1))
    gn = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n_pix, 1))

    # 0) null baseline (loop floor)
    def st_null(c):
        oo, acc = c
        return oo, acc + oo[:, 0]
    timeit("null baseline", loop16(st_null), (o, jnp.zeros(n_pix)))

    # 1) full closest-hit (worklist + kernel). Chain t output into o so DCE
    # can't elide.
    def st_hit(c):
        oo, acc = c
        h = intersect_pallas(geom, pt_tab, oo, d)
        return oo + 0.0 * h.t[:, None], acc + h.t
    timeit("closest-hit total", loop16(st_hit), (o, jnp.zeros(n_pix)))

    # 2) kernel only: fixed worklist
    tmin_a, tmax_a = _ray_ranges(n_pix, RAY_EPSILON, jnp.inf, None)
    rr, _ = _pack_rays(o, d, tmin_a, tmax_a, 256)
    wl0, cnt0, wtn0 = jax.jit(
        lambda r: _build_worklist(r, pt_tab.boxes))(rr)
    echunk, einst, itrs = _prefetch_tables(pt_tab)

    def st_kernel(c):
        rr_, acc = c
        t, idx, _inst = _run_kernel(
            wl0, wtn0, cnt0, pt_tab.boxes, echunk, einst, itrs, rr_,
            pt_tab.tris, pt_tab.chunk, pt_tab.n_entries, rb=256)
        return rr_ + 0.0 * t.sum(), acc + t[:, 0, 0]
    timeit("closest kernel only", loop16(st_kernel),
           (rr, jnp.zeros(rr.shape[0])))

    def st_kernel_any(c):
        rr_, acc = c
        (hh,) = _run_kernel_any(
            wl0, wtn0, cnt0, pt_tab.boxes, echunk, einst, itrs, rr_,
            pt_tab.tris, pt_tab.chunk, pt_tab.n_entries, rb=256)
        return rr_ + 0.0 * hh.sum().astype(jnp.float32), acc + hh[:, 0, 0]
    timeit("anyhit kernel only", loop16(st_kernel_any),
           (rr, jnp.zeros(rr.shape[0], jnp.int32)))

    # 3) worklist build alone
    def st_wl(c):
        rr_, acc = c
        wl, cnt, wtn = _build_worklist(rr_, pt_tab.boxes)
        return rr_ + 0.0 * cnt.sum().astype(jnp.float32), acc + cnt
    timeit("worklist build", loop16(st_wl),
           (rr, jnp.zeros(rr.shape[0], jnp.int32)))

    # 4) pack rays
    def st_pack(c):
        oo, acc = c
        r2, _ = _pack_rays(oo, d, tmin_a, tmax_a, 256)
        return oo + 0.0 * r2[0, 0, 0], acc + r2[:, 0, 0]
    timeit("pack_rays", loop16(st_pack), (o, jnp.zeros(192)))

    # 5) resolve_sp
    def st_rsp(c):
        t, acc = c
        h2 = hit._replace(t=hit.t + 0.0 * t)
        s2 = resolve_sp(scene, h2, o, d)
        return t + 0.0 * s2.p[:, 0], acc + s2.p[:, 0]
    timeit("resolve_sp", loop16(st_rsp), (jnp.zeros(n_pix), jnp.zeros(n_pix)))

    # 6) gather_lobes
    def st_gl(c):
        uv, acc = c
        l = gather_lobes(scene, sp.mat_id, uv, sp.p, lam)
        return uv + 0.0 * l.s0.sum(), acc + l.s0[..., 0].sum(axis=-1)
    lob = jax.jit(lambda: gather_lobes(scene, sp.mat_id, sp.uv, sp.p, lam))()
    timeit("gather_lobes", loop16(st_gl), (sp.uv, jnp.zeros(n_pix)))

    # 7) bsdf stages
    def st_ev(c):
        w, acc = c
        fs = bsdf_evaluate(lob, w, w, gn, hero)
        pdf = bsdf_pdf(lob, w, w, gn, hero)
        return w + 0.0 * (fs.sum() + pdf.sum()), acc + fs[:, 0] + pdf
    timeit("bsdf_evaluate+pdf", loop16(st_ev), (wo, jnp.zeros(n_pix)))

    def st_smp(c):
        w, acc = c
        smp = bsdf_sample(lob, w, gn, hero, jnp.zeros((n_pix,), bool),
                          u, u, u)
        return w + 0.0 * smp.pdf.sum(), acc + smp.pdf
    timeit("bsdf_sample", loop16(st_smp), (wo, jnp.zeros(n_pix)))

    # 8) sort key + argsort + full-state permute (13 arrays)
    def st_sort(c):
        oo, acc = c
        key = _ray_sort_key(scene, oo, d, jnp.ones(n_pix, bool))
        order = jnp.argsort(key)
        return oo[order], acc + key
    timeit("sortkey+argsort+permute-o", loop16(st_sort),
           (o, jnp.zeros(n_pix, jnp.uint32)))


if __name__ == "__main__":
    main()

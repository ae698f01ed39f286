"""Experiment: does sorting rays by (quantized) first-contact point tighten
per-block worklist unions on the RTC3-class grass scene?

Current _ray_sort_key = octant | Morton(origin); for primary rays the origin
is the camera for every ray, so blocks are scanline-ordered pixels and their
chunk unions are huge (mean 176 entries/block, BENCH_r04 diagnostics).

Here: per ray, find the near distance tn* of the NEAREST worklist entry box
it enters (chunked over entries to bound memory), take p = o + tn* d as a
first-geometry-contact estimate, and sort rays by Morton(p). Compare worklist
stats + kernel wall time against the shipped sort.

Run: python tools/exp_locality_sort.py
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


def timeit(label, fn, n=5):
    out = fn()
    jax.tree.map(lambda x: jax.block_until_ready(x), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree.map(lambda x: jax.block_until_ready(x), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:52s} {dt*1e3:9.2f} ms")
    return out


def nearest_entry_tn(o, d, boxes, block=256):
    """Per-ray near distance of the nearest slab-hit entry box (T_FAR if
    none), chunked over entries."""
    r = o.shape[0]
    ne = boxes.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d >= 0, 1e-20, -1e-20), d)

    @jax.jit
    def step(carry, bchunk):
        best = carry
        tn = jnp.full((r, bchunk.shape[0]), -3e38, jnp.float32)
        tf = jnp.full((r, bchunk.shape[0]), 3e38, jnp.float32)
        for a in range(3):
            t0 = (bchunk[None, :, a] - o[:, a, None]) * inv[:, a, None]
            t1 = (bchunk[None, :, 3 + a] - o[:, a, None]) * inv[:, a, None]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (tn <= tf) & (tf >= 0.0) & (bchunk[None, :, 6] > 0.5)
        tn_ok = jnp.where(ok, jnp.maximum(tn, 0.0), 3e38)
        return jnp.minimum(best, jnp.min(tn_ok, axis=1)), None

    best = jnp.full((r,), 3e38, jnp.float32)
    for s in range(0, ne, block):
        best, _ = step(best, boxes[s:s + block])
    return best


def morton_key(p, lo, ext):
    q = jnp.clip((p - lo) / ext * 511.0, 0.0, 511.0).astype(jnp.uint32)

    def expand9(v):
        v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
        return v

    return ((expand9(q[..., 0]) << jnp.uint32(2))
            | (expand9(q[..., 1]) << jnp.uint32(1))
            | expand9(q[..., 2]))


def main():
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.accel.pallas_intersect import (
        _build_worklist, _pack_rays, _ray_ranges, _prefetch_tables,
        _run_kernel, _scene_exit_clamp, RAY_EPSILON, worklist_stats)
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.render.pt import _ray_sort_key

    n_side = int(os.environ.get("N_SIDE", "64"))
    scene = grass_field(n_side=n_side, blade_segments=13,
                        animated_fraction=0.25)
    pt = scene.pallas_tris
    print(f"entries={pt.n_entries} chunks={pt.n_chunks}")

    w, h = 512, 384
    r = w * h
    px = (jnp.arange(r) % w).astype(jnp.float32)
    py = (jnp.arange(r) // w).astype(jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(w),
                              jnp.uint32(h), jnp.zeros(r), jnp.zeros(r))
    o0, d0 = rays.o, rays.d
    f = jnp.zeros((r,), jnp.float32)
    echunk, einst, itrs = _prefetch_tables(pt)
    tmin_a, tmax_a = _ray_ranges(r, RAY_EPSILON, jnp.inf, None)

    def full_stats(tag, o, d):
        tmax_c = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
        packed, _ = _pack_rays(o, d, tmin_a, tmax_c, 256, f=f)
        wl, cnt, wtn = jax.jit(
            lambda rr: _build_worklist(rr, pt.boxes))(packed)
        c = np.asarray(cnt)
        print(f"{tag}: mean entries/block {c.mean():.1f}  "
              f"p50 {np.percentile(c, 50):.0f}  p90 {np.percentile(c, 90):.0f}"
              f"  max {c.max()}")

        def run():
            return _run_kernel(wl, wtn, cnt, pt.boxes, echunk, einst, itrs,
                               packed, pt.tris, pt.chunk, pt.n_entries,
                               rb=256)
        timeit(f"kernel [{tag}]", run)

    # Baseline: shipped sort.
    key = _ray_sort_key(scene, o0, d0, jnp.ones((r,), bool))
    order = jnp.argsort(key)
    full_stats("shipped-sort", o0[order], d0[order])

    # Hit-point locality sort.
    t_near = nearest_entry_tn(o0, d0, pt.boxes)
    p = o0 + jnp.where(t_near < 3e38, t_near, 0.0)[:, None] * d0
    lo = scene.world_center - scene.world_radius
    ext = jnp.maximum(2.0 * scene.world_radius, 1e-12)
    hkey = morton_key(p, lo, ext)
    order_h = jnp.argsort(hkey)
    full_stats("hitpoint-sort", o0[order_h], d0[order_h])

    # Hit-point + octant (direction still matters for the tail of the walk).
    octant = (((d0[..., 0] < 0).astype(jnp.uint32) << jnp.uint32(2))
              | ((d0[..., 1] < 0).astype(jnp.uint32) << jnp.uint32(1))
              | (d0[..., 2] < 0).astype(jnp.uint32))
    hkey2 = (morton_key(p, lo, ext) << jnp.uint32(3)) | octant
    order_h2 = jnp.argsort(hkey2)
    full_stats("hitpoint+octant", o0[order_h2], d0[order_h2])

    # Scrambled bounce-like rays, both sorts.
    k = jax.random.PRNGKey(0)
    d2 = jax.random.normal(k, (r, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    o2 = o0 + d0 * 0.5
    key_b = _ray_sort_key(scene, o2, d2, jnp.ones((r,), bool))
    ob = jnp.argsort(key_b)
    full_stats("bounce shipped-sort", o2[ob], d2[ob])
    t_near2 = nearest_entry_tn(o2, d2, pt.boxes)
    p2 = o2 + jnp.where(t_near2 < 3e38, t_near2, 0.0)[:, None] * d2
    hkey_b = (morton_key(p2, lo, ext) << jnp.uint32(3)) | octant
    ob2 = jnp.argsort(hkey_b)
    full_stats("bounce hitpoint+octant", o2[ob2], d2[ob2])

    # FINAL CANDIDATE: octant-major | Morton27(contact point), tn from
    # 16-entry SUPER boxes (the cheap per-iteration form).
    g = 16
    nb_sup = -(-pt.n_entries // g)
    bx = np.asarray(pt.boxes)
    sup = np.zeros((nb_sup, 8), np.float32)
    for i in range(nb_sup):
        grp = bx[i * g:(i + 1) * g]
        val = grp[:, 6] > 0.5
        if val.any():
            sup[i, 0:3] = grp[val, 0:3].min(axis=0)
            sup[i, 3:6] = grp[val, 3:6].max(axis=0)
            sup[i, 6] = 1.0
    sup_j = jnp.asarray(sup)
    print(f"supers: {nb_sup}")

    def final_key(o, d):
        tn = nearest_entry_tn(o, d, sup_j)
        p_ = o + jnp.where(tn < 3e38, tn, 0.0)[:, None] * d
        oct_ = (((d[..., 0] < 0).astype(jnp.uint32) << jnp.uint32(2))
                | ((d[..., 1] < 0).astype(jnp.uint32) << jnp.uint32(1))
                | (d[..., 2] < 0).astype(jnp.uint32))
        return (oct_ << jnp.uint32(27)) | morton_key(p_, lo, ext)

    t0 = time.perf_counter()
    kf = jax.jit(final_key)
    _ = kf(o0, d0).block_until_ready()
    t1 = time.perf_counter()
    for _ in range(5):
        kk = kf(o0, d0)
    kk.block_until_ready()
    print(f"final key compute: {(time.perf_counter()-t1)/5*1e3:.2f} ms "
          f"(compile {t1-t0:.1f}s)")
    of = jnp.argsort(kk)
    full_stats("primary octmajor+hitpoint(super)", o0[of], d0[of])
    kb = kf(o2, d2)
    ofb = jnp.argsort(kb)
    full_stats("bounce octmajor+hitpoint(super)", o2[ofb], d2[ofb])


if __name__ == "__main__":
    main()

"""Where does the RTC3-class instanced scene's time go?

Times (on TPU) the grass_field scene's closest-hit cast in isolation —
worklist build vs kernel — plus worklist entry statistics, at primary-ray
and post-bounce (scrambled) distributions. Run: python tools/profile_grass.py
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
    print(f"{label:48s} {dt*1e3:9.2f} ms")
    return out


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
    print(f"n_side={n_side}: chunks={pt.n_chunks} entries={pt.n_entries} "
          f"chunk_size={pt.chunk} tris_hbm={pt.tris.nbytes/1e6:.1f} MB")

    w, h = 512, 384
    r = w * h
    px = (jnp.arange(r) % w).astype(jnp.float32)
    py = (jnp.arange(r) // w).astype(jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(w),
                              jnp.uint32(h), jnp.zeros(r), jnp.zeros(r))
    o, d = rays.o, rays.d
    # sort like the wavefront does
    key = _ray_sort_key(scene, o, d, jnp.ones((r,), bool))
    order = jnp.argsort(key)
    o, d = o[order], d[order]
    f = jnp.zeros((r,), jnp.float32)

    stats = worklist_stats(pt, o, d)
    print("primary:", stats)

    tmin_a, tmax_a = _ray_ranges(r, RAY_EPSILON, jnp.inf, None)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    packed, _ = _pack_rays(o, d, tmin_a, tmax_a, 256, f=f)
    echunk, einst, itrs = _prefetch_tables(pt)

    wl_fn = jax.jit(lambda rr: _build_worklist(rr, pt.boxes))
    wl, cnt, wtn = timeit("worklist build (XLA)", lambda: wl_fn(packed))
    c = np.asarray(cnt)
    print(f"  mean entries/block {c.mean():.1f}  max {c.max()}  "
          f"p90 {np.percentile(c, 90):.0f}")

    def run():
        return _run_kernel(wl, wtn, cnt, pt.boxes, echunk, einst, itrs,
                           packed, pt.tris, pt.chunk, pt.n_entries, rb=256)

    timeit("closest-hit kernel", run)

    # post-bounce distribution: scramble directions (diffuse-ish)
    k = jax.random.PRNGKey(0)
    d2 = jax.random.normal(k, (r, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    o2 = o + d * 0.5
    key2 = _ray_sort_key(scene, o2, d2, jnp.ones((r,), bool))
    order2 = jnp.argsort(key2)
    o2, d2 = o2[order2], d2[order2]
    packed2, _ = _pack_rays(o2, d2, tmin_a, tmax_a, 256, f=f)
    wl2, cnt2, wtn2 = wl_fn(packed2)
    c2 = np.asarray(cnt2)
    print(f"bounce: mean entries/block {c2.mean():.1f}  max {c2.max()}")

    def run2():
        return _run_kernel(wl2, wtn2, cnt2, pt.boxes, echunk, einst, itrs,
                           packed2, pt.tris, pt.chunk, pt.n_entries, rb=256)

    timeit("closest-hit kernel (bounce rays)", run2)


if __name__ == "__main__":
    main()
